"""Wurlitzer 200A tremolo — Twin-T oscillator circuit + CdS vactrol + divider.

The Twin-T oscillator (TR-3/TR-4, ~5.3 Hz) drives an LED at fixed ~0.84 mA;
the CdS cell's resistance (asymmetric attack/release envelope + power law)
feeds the 50 kΩ vibrato-pot 3-terminal divider whose output impedance is the
shunt the preamp feedback node sees. Depth lives ONLY in the divider.

Behaviour-parity rebuild of crates/openwurli-dsp/src/tremolo.rs with the
oscillator solved by our generic MNA solver from the same circuit topology
(spice/melange/wurli-tremolo.cir). The oscillator's DC operating point is an
unstable equilibrium — `init_state` settles 2 s from a perturbed start so
the oscillation reaches steady amplitude (the reference caches the same via
OnceLock; use `settled_state` for the cached path).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp

from openwurli_tpu.circuits import mna

# CdS vactrol dynamics — LG-1 (#142312, VTL5C-class).
ATTACK_TAU = 0.0025
RELEASE_TAU = 0.035
GAMMA = 0.9
R_LDR_MIN = 9_000.0
R_LDR_MAX = 1_000_000.0

# Vibrato depth network (schematic #203720-S-3).
R18_SERIES = 680.0
R_VIB_BRIDGE = 18_000.0
R_VIB_POT = 50_000.0

# Twin-T output swing (from the reference's ngspice/melange validation).
V_OUT_MIN = 0.70
V_OUT_MAX = 10.95

SETTLE_SECONDS = 2.0


def build_netlist() -> mna.Netlist:
    """Twin-T oscillator (spice/melange/wurli-tremolo.cir)."""
    nl = mna.Netlist()
    q2n2924 = mna.BjtModel(is_=1.4e-14, bf=200.0)
    # Twin-T feedback: highpass T (C17-C16, R12) + lowpass T (R14-R13, C18)
    nl.c("out", "node_hp", 0.12e-6)
    nl.c("node_hp", "base3", 0.12e-6)
    nl.r("node_hp", "0", 27e3)
    nl.r("out", "node_lp", 680e3)
    nl.r("node_lp", "base3", 680e3)
    nl.c("node_lp", "0", 0.12e-6)
    # TR-3 oscillator amplifier
    nl.bjt("Q3", "out", "base3", "emit3", q2n2924)
    nl.r("base3", "0", 680e3)
    nl.r("emit3", "0", 10e3)
    # TR-4 LED driver buffer
    nl.bjt("Q4", "out", "emit3", "0", q2n2924)
    # Shared collector load + stray cap + supply
    nl.r("vcc", "out", 4.7e3)
    nl.c("out", "0", 1e-12)
    nl.v("V1", "vcc", "0", 15.0)
    return nl


class TremoloParams(NamedTuple):
    solver: mna.SolverParams
    out_idx: int
    sample_rate: float
    ldr_attack: jnp.ndarray
    ldr_release: jnp.ndarray


class TremoloState(NamedTuple):
    osc: mna.SolverState
    ldr_envelope: jnp.ndarray  # (...,)
    r_ldr: jnp.ndarray  # (...,)


# math.log (not jnp) on purpose: an eager jnp op at import time would
# initialise a JAX backend before callers can pick one.
_LN_R_MAX = math.log(R_LDR_MAX)
_LN_MIN_MINUS_MAX = math.log(R_LDR_MIN) - math.log(R_LDR_MAX)


@lru_cache(maxsize=None)
def _cached_netlist():
    return build_netlist()


@lru_cache(maxsize=None)
def make_params(sample_rate) -> TremoloParams:
    nl = _cached_netlist()
    solver = mna.make_solver_params(nl, sample_rate, integrator="trap")
    dt = 1.0 / sample_rate
    return TremoloParams(
        solver=solver,
        out_idx=nl._nodes["out"],
        sample_rate=float(sample_rate),
        ldr_attack=jnp.exp(jnp.asarray(-dt / ATTACK_TAU, dtype=jnp.float64)),
        ldr_release=jnp.exp(jnp.asarray(-dt / RELEASE_TAU, dtype=jnp.float64)),
    )


@lru_cache(maxsize=None)
def _osc_step_fn(sample_rate):
    # Smooth ~5.5 Hz oscillation: warm-started NR converges in 1-2 iters.
    return mna.make_step(_cached_netlist(), make_params(sample_rate).solver,
                         max_iter=50, nr_iters=4)


def osc_step(params: TremoloParams, osc: mna.SolverState):
    """One oscillator sample → LED drive in [0, 1]."""
    step = _osc_step_fn(params.sample_rate)
    osc, v = step(osc, jnp.zeros_like(params.solver.w))
    v_out = v[..., params.out_idx]
    led = jnp.clip((V_OUT_MAX - v_out) / (V_OUT_MAX - V_OUT_MIN), 0.0, 1.0)
    return osc, led


_SETTLED_CACHE_PATH = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.dirname(__file__)),
    "data", "tremolo_settled.npz")


@lru_cache(maxsize=None)
def settled_osc_state(sample_rate):
    """Oscillator state at steady amplitude (cached per rate).

    DC OP is the unstable equilibrium — perturb the output node slightly and
    run 2 s so the Twin-T limit cycle builds up (tremolo.rs:92-102,191-216).

    The 2 s settle is a ~176k-step serial scan — cheap on CPU, pathological
    on a remote TPU, so settled states for common rates ship as package
    data (data/tremolo_settled.npz, regenerable via
    tools/gen_settled_states.py) and are recomputed only on a cache miss.
    """
    import os

    import numpy as np

    key = f"sr{int(round(sample_rate))}"
    if os.path.exists(_SETTLED_CACHE_PATH):
        z = np.load(_SETTLED_CACHE_PATH)
        if f"{key}_v" in z:
            return mna.SolverState(
                v=jnp.asarray(z[f"{key}_v"], dtype=jnp.float64),
                i_nl=jnp.asarray(z[f"{key}_i"], dtype=jnp.float64),
                v_nl=jnp.asarray(z[f"{key}_vnl"], dtype=jnp.float64),
                nr_resid=jnp.zeros((), dtype=jnp.float64),
                diag=mna.init_diag(),
            )

    params = make_params(sample_rate)
    osc = mna.init_state(params.solver)
    osc = osc._replace(v=osc.v.at[params.out_idx].add(1e-3))
    step = _osc_step_fn(sample_rate)
    w0 = jnp.zeros_like(params.solver.w)

    @jax.jit
    def settle(osc):
        def body(st, _):
            st, _v = step(st, w0)
            return st, None

        st, _ = jax.lax.scan(body, osc, None,
                             length=int(sample_rate * SETTLE_SECONDS))
        return st

    return jax.block_until_ready(settle(osc))


def init_state(sample_rate, batch_shape=()) -> TremoloState:
    """Settled oscillator + dark LDR, broadcast over batch dims."""
    osc = settled_osc_state(sample_rate)
    osc_b = mna.SolverState(
        v=jnp.broadcast_to(osc.v, batch_shape + osc.v.shape),
        i_nl=jnp.broadcast_to(osc.i_nl, batch_shape + osc.i_nl.shape),
        v_nl=jnp.broadcast_to(osc.v_nl, batch_shape + osc.v_nl.shape),
        nr_resid=jnp.broadcast_to(osc.nr_resid, batch_shape),
        diag=mna.init_diag(batch_shape),
    )
    return TremoloState(
        osc=osc_b,
        ldr_envelope=jnp.zeros(batch_shape, dtype=jnp.float64),
        r_ldr=jnp.full(batch_shape, R_LDR_MAX, dtype=jnp.float64),
    )


def shunt_impedance(depth, r_ldr):
    """Vibrato divider: Z = (R_up ∥ 18k) + (R_low ∥ (680 + R_ldr))."""
    depth = jnp.asarray(depth, dtype=jnp.float64)
    r_upper = R_VIB_POT * (1.0 - depth)
    r_lower = R_VIB_POT * depth
    top = jnp.where(r_upper > 0.0,
                    r_upper * R_VIB_BRIDGE / (r_upper + R_VIB_BRIDGE), 0.0)
    branch = R18_SERIES + r_ldr
    low = jnp.where(r_lower > 0.0,
                    r_lower * branch / (r_lower + branch), 0.0)
    return top + low


def step(params: TremoloParams, state: TremoloState, depth):
    """One sample: oscillator → vactrol envelope → CdS R → divider shunt Ω."""
    osc, led_drive = osc_step(params, state.osc)

    coeff = jnp.where(led_drive > state.ldr_envelope,
                      params.ldr_attack, params.ldr_release)
    env = led_drive + coeff * (state.ldr_envelope - led_drive)

    drive = jnp.clip(env, 0.0, 1.0)
    log_r = _LN_R_MAX + _LN_MIN_MINUS_MAX * jnp.power(
        jnp.maximum(drive, 1e-30), GAMMA)
    r_ldr = jnp.where(drive < 1e-6, R_LDR_MAX, jnp.exp(log_r))

    return (TremoloState(osc=osc, ldr_envelope=env, r_ldr=r_ldr),
            shunt_impedance(depth, r_ldr))
