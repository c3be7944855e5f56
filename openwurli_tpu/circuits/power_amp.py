"""Wurlitzer 200A power amplifier — Class AB circuit solver + rail dynamics.

Quasi-complementary push-pull (~20 W into 8 Ω): PNP diff pair (2N5087) →
NPN VAS (MPSA06) → Vbe multiplier → Sziklai output pairs (TIP36C/TIP35C)
with global negative feedback. Solved by the generic MNA solver from the
same topology as spice/melange/wurli-power-amp.cir, with the reference's
backward-Euler primary integrator (dissipative — the safe choice for the
stiff output stage).

Adapter behaviours mirrored from crates/openwurli-dsp/src/power_amp.rs:
  * HEADROOM (22 V) output normalisation
  * divergence guard — on NaN / NR exhaustion / any node |v| > 100 V,
    reset the solver to its DC operating point and hold the last
    confirmed-good output (waveform continuity across a divergence burst)
  * RailDynamics — behavioral rail sag: idle ±24.5 V sagging toward ±22 V
    at rated load, two-stage filtering (30 ms current envelope, 8/15 ms
    asymmetric rail attack/release), pushed per-sample as runtime V offsets
  * behavioral closed-loop NR model (the reference's legacy-power-amp
    feature) as a cheap alternative path

All steps are batched over engine instances.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax.numpy as jnp

from openwurli_tpu.circuits import mna

HEADROOM = 22.0

# Rail-sag calibration (power_amp.rs:11-45, docs output-stage.md §4.3.1)
RAIL_V_OPEN = 24.5
RAIL_DC_BIAS = 22.5
RAIL_R_EFF = 3.5
SPEAKER_LOAD_OHMS = 8.0
RAIL_TAU_ATTACK = 0.008
RAIL_TAU_RELEASE = 0.015
RAIL_TAU_I_AVG = 0.030

MAX_ITER = 70


def build_netlist() -> mna.Netlist:
    """spice/melange/wurli-power-amp.cir topology."""
    nl = mna.Netlist()
    q2n5087 = mna.BjtModel(
        is_=3.18e-14, bf=254.8, nf=1.003, vaf=115.0, ikf=0.01, ise=5.32e-15,
        ne=1.34, br=3.56, nr=1.005, var=26.0, ikr=0.01, isc=1.7e-13, nc=1.214,
        cje=3.33e-12, cjc=1.66e-12)
    mpsa06 = mna.BjtModel(
        is_=1.5e-14, bf=200.0, nf=1.0, vaf=100.0, ikf=0.2, ise=5e-13, ne=1.5,
        br=4.0, nr=1.0, var=20.0, ikr=0.1, cje=10e-12, cjc=6e-12)
    mpsa56 = mna.BjtModel(
        is_=1.5e-14, bf=200.0, nf=1.0, vaf=100.0, ikf=0.2, ise=5e-13, ne=1.5,
        br=4.0, nr=1.0, var=20.0, ikr=0.1, cje=10e-12, cjc=6e-12)
    tip35c = mna.BjtModel(
        is_=5e-12, bf=60.0, nf=1.0, vaf=80.0, ikf=5.0, ise=3e-10, ne=1.8,
        br=5.0, nr=1.0, var=20.0, ikr=1.0, cje=200e-12, cjc=150e-12)
    tip36c = mna.BjtModel(
        is_=5e-12, bf=40.0, nf=1.0, vaf=60.0, ikf=5.0, ise=3e-10, ne=1.8,
        br=4.0, nr=1.0, var=20.0, ikr=1.0, cje=200e-12, cjc=180e-12)

    # Input coupling + bias
    nl.c("in", "in_ac", 4.7e-6)
    nl.c("in_ac", "0", 1e-9)
    nl.c("in", "0", 1e-12)
    nl.r("in_ac", "0", 15e3)
    # Differential pair (PNP)
    nl.r("emit_pair", "vp", 10e3)
    nl.bjt("Q7", "coll7", "in_ac", "emit_pair", q2n5087, pnp=True)
    nl.bjt("Q8", "coll8", "fb_inv", "emit_pair", q2n5087, pnp=True)
    nl.r("coll7", "vn", 1e3)
    nl.r("coll8", "vn", 1e-3)
    # Feedback network
    nl.r("out", "fb_inv", 15e3)
    nl.r("fb_inv", "c10_node", 220.0)
    nl.c("c10_node", "0", 22e-6)
    # VAS + Miller compensation + bootstrapped load
    nl.bjt("Q14", "drv_bot", "coll7", "vn", mpsa06)
    nl.c("drv_bot", "coll7", 100e-12)
    nl.r("vp", "boot", 1.8e3)
    nl.r("boot", "vas_out", 1.8e3)
    nl.c("boot", "out", 100e-6)
    # Vbe multiplier
    nl.bjt("Q9", "vas_out", "bias_mid", "drv_bot", mpsa06)
    nl.r("vas_out", "bias_mid", 160.0)
    nl.r("bias_mid", "drv_bot", 220.0)
    # Top Sziklai (NPN driver + PNP output)
    nl.bjt("Q10", "base11", "vas_out", "nodeC", mpsa06)
    nl.bjt("Q11", "nodeC", "base11", "vp", tip36c, pnp=True)
    nl.r("base11", "vp", 270.0)
    # Bottom Sziklai (PNP driver + NPN output)
    nl.bjt("Q12", "base13", "drv_bot", "nodeD", mpsa56, pnp=True)
    nl.bjt("Q13", "nodeD", "base13", "vn", tip35c)
    nl.r("base13", "vn", 270.0)
    # Output emitter resistors + speaker load
    nl.r("nodeC", "out", 0.47)
    nl.r("nodeD", "out", 0.47)
    nl.r("out", "0", SPEAKER_LOAD_OHMS)
    # Supplies (runtime rail offsets) + input drive
    nl.v("V1", "vp", "0", RAIL_DC_BIAS)
    nl.v("V2", "0", "vn", RAIL_DC_BIAS)
    nl.set_input("in")
    return nl


@lru_cache(maxsize=None)
def _cached_netlist():
    return build_netlist()


class PowerAmpParams(NamedTuple):
    solver: mna.SolverParams
    out_idx: int
    v1_row: int
    v2_row: int
    input_row: int
    sample_rate: float
    # Rail dynamics coefficients
    alpha_attack: jnp.ndarray
    alpha_release: jnp.ndarray
    alpha_i_avg: jnp.ndarray


class RailState(NamedTuple):
    """Behavioral rail-sag state (power_amp.rs RailDynamics)."""

    v_rail_pos: jnp.ndarray
    v_rail_neg: jnp.ndarray
    i_avg_pos: jnp.ndarray
    i_avg_neg: jnp.ndarray


class PowerAmpState(NamedTuple):
    circuit: mna.SolverState
    rails: RailState
    last_good: jnp.ndarray  # (...,)


@lru_cache(maxsize=None)
def make_params(sample_rate, rails_included=True) -> PowerAmpParams:
    nl = _cached_netlist()
    solver = mna.make_solver_params(nl, sample_rate, integrator="be")
    asm_rows = nl.assemble()
    dt = 1.0 / sample_rate
    e = lambda tau: jnp.asarray(1.0 - jnp.exp(jnp.asarray(-dt / tau)),
                                dtype=jnp.float64)
    return PowerAmpParams(
        solver=solver,
        out_idx=nl._nodes["out"],
        v1_row=asm_rows["vsrc_rows"]["V1"],
        v2_row=asm_rows["vsrc_rows"]["V2"],
        input_row=asm_rows["input_row"],
        sample_rate=float(sample_rate),
        alpha_attack=e(RAIL_TAU_ATTACK),
        alpha_release=e(RAIL_TAU_RELEASE),
        alpha_i_avg=e(RAIL_TAU_I_AVG),
    )


@lru_cache(maxsize=None)
def _step_fn(sample_rate):
    # 16 masked NR iterations: hard clip onsets transiently need the
    # extra travel (8 leaves the solver stuck past the divergence guard —
    # see test_rail_clipping); typical warm-started samples converge in
    # 2-4 and the rest are masked no-ops.
    return mna.make_step(_cached_netlist(), make_params(sample_rate).solver,
                         max_iter=MAX_ITER, nr_iters=16)


def init_rails(batch_shape=()) -> RailState:
    z = jnp.zeros(batch_shape, dtype=jnp.float64)
    b = jnp.full(batch_shape, RAIL_DC_BIAS, dtype=jnp.float64)
    return RailState(v_rail_pos=b, v_rail_neg=b, i_avg_pos=z, i_avg_neg=z)


def init_state(params: PowerAmpParams, batch_shape=()) -> PowerAmpState:
    return PowerAmpState(
        circuit=mna.init_state(params.solver, batch_shape),
        rails=init_rails(batch_shape),
        last_good=jnp.zeros(batch_shape, dtype=jnp.float64),
    )


def rails_step(params: PowerAmpParams, rails: RailState, v_out) -> RailState:
    """Two-stage rail dynamics (power_amp.rs:128-155): current envelope
    (30 ms) → load-line target → asymmetric attack/release."""
    i_pos = jnp.maximum(v_out / SPEAKER_LOAD_OHMS, 0.0)
    i_neg = jnp.maximum(-v_out / SPEAKER_LOAD_OHMS, 0.0)
    i_avg_pos = rails.i_avg_pos + params.alpha_i_avg * (i_pos - rails.i_avg_pos)
    i_avg_neg = rails.i_avg_neg + params.alpha_i_avg * (i_neg - rails.i_avg_neg)
    target_pos = RAIL_V_OPEN - i_avg_pos * RAIL_R_EFF
    target_neg = RAIL_V_OPEN - i_avg_neg * RAIL_R_EFF
    a_p = jnp.where(target_pos < rails.v_rail_pos,
                    params.alpha_attack, params.alpha_release)
    a_n = jnp.where(target_neg < rails.v_rail_neg,
                    params.alpha_attack, params.alpha_release)
    return RailState(
        v_rail_pos=rails.v_rail_pos + a_p * (target_pos - rails.v_rail_pos),
        v_rail_neg=rails.v_rail_neg + a_n * (target_neg - rails.v_rail_neg),
        i_avg_pos=i_avg_pos,
        i_avg_neg=i_avg_neg,
    )


def step(params: PowerAmpParams, state: PowerAmpState, x, rail_sag=True):
    """One circuit sample. x: (...) input volts. Returns (state, out∈[-1,1]).

    Rail offsets from the previous sample's rail state are pushed into the
    source vector BEFORE the solve; rails update AFTER from the raw output.
    `rail_sag` may be a python bool or a traced boolean (runtime toggle —
    when off, rails pin at the ±22.5 V static bias, bit-compat A/B).
    """
    x = jnp.asarray(x, dtype=jnp.float64)
    sag = jnp.asarray(rail_sag)
    sag_f = sag.astype(jnp.float64)
    n = params.solver.w.shape[0]
    w_extra = jnp.zeros(x.shape + (n,), dtype=jnp.float64)
    off_pos = (state.rails.v_rail_pos - RAIL_DC_BIAS) * sag_f
    off_neg = (state.rails.v_rail_neg - RAIL_DC_BIAS) * sag_f
    w_extra = w_extra.at[..., params.v1_row].set(off_pos)
    w_extra = w_extra.at[..., params.v2_row].set(off_neg)
    w_extra = w_extra.at[..., params.input_row].set(x)

    circuit, v = _step_fn(params.sample_rate)(state.circuit, w_extra)
    raw = v[..., params.out_idx]
    result = raw / HEADROOM

    # Divergence guard (power_amp.rs:388-421), in two tiers:
    #   * insane (non-finite output / node |v| > 100 V) → reset the solver
    #     to its DC operating point AND hold last confirmed-good output.
    #   * NR non-convergence (residual > 1 mV — the fixed-count masked NR's
    #     analogue of the reference's 70-iteration exhaustion) → hold the
    #     output but KEEP the solver state: the warm-started NR continues
    #     converging on subsequent samples. Resetting state here would
    #     death-spiral (a DC-OP warm start can be tens of volts from a
    #     clipped operating point, guaranteeing the next failure).
    nr_failed = circuit.nr_resid > 1e-3
    node_v = circuit.v[..., : params.solver.s.shape[0]]
    insane = jnp.any(~jnp.isfinite(node_v) | (jnp.abs(node_v) > 100.0),
                     axis=-1)
    reset = ~jnp.isfinite(result) | insane
    bad = reset | nr_failed

    clean = mna.init_state(params.solver, bad.shape)
    circuit = mna.SolverState(
        v=jnp.where(reset[..., None], clean.v, circuit.v),
        i_nl=jnp.where(reset[..., None], clean.i_nl, circuit.i_nl),
        v_nl=jnp.where(reset[..., None], clean.v_nl, circuit.v_nl),
        nr_resid=circuit.nr_resid,
        diag=circuit.diag,
    )
    clamped = jnp.clip(result, -1.0, 1.0)
    out = jnp.where(bad, state.last_good, clamped)
    last_good = jnp.where(bad, state.last_good, clamped)

    stepped = rails_step(params, state.rails, raw)
    clean_rails = init_rails(bad.shape)
    rails = RailState(*[
        jnp.where(sag, jnp.where(bad, ini, new), old)
        for new, old, ini in zip(stepped, state.rails, clean_rails)])

    return PowerAmpState(circuit=circuit, rails=rails,
                         last_good=last_good), out


# ── Behavioral closed-loop model (reference legacy-power-amp path) ───────

OPEN_LOOP_GAIN = 19_000.0
FEEDBACK_BETA = 220.0 / (220.0 + 15_000.0)
CROSSOVER_VT = 0.013
QUIESCENT_GAIN = 0.1
BEHAVIORAL_NR_ITER = 8


def behavioral_process(x):
    """Memoryless closed-loop NR solve (power_amp.rs:167-276 behavioral).

    y solves y = f(A(x − βy)) with f = crossover gain blend + tanh rail
    clip. Stateless, batched; returns output normalised to ±1.
    """
    x = jnp.asarray(x, dtype=jnp.float64)
    clg = OPEN_LOOP_GAIN / (1.0 + OPEN_LOOP_GAIN * FEEDBACK_BETA)
    y = jnp.clip(x * clg, -HEADROOM + 1e-6, HEADROOM - 1e-6)
    vt_sq = CROSSOVER_VT * CROSSOVER_VT
    q = QUIESCENT_GAIN

    for _ in range(BEHAVIORAL_NR_ITER):
        v = OPEN_LOOP_GAIN * (x - FEEDBACK_BETA * y)
        exp_term = jnp.exp(-v * v / vt_sq)
        cross_gain = q + (1.0 - q) * (1.0 - exp_term)
        v_cross = v * cross_gain
        dcross_dv = cross_gain + v * (1.0 - q) * (2.0 * v / vt_sq) * exp_term
        tanh_val = jnp.tanh(v_cross / HEADROOM)
        f_val = HEADROOM * tanh_val
        f_deriv = (1.0 - tanh_val * tanh_val) * dcross_dv
        residual = y - f_val
        jacobian = 1.0 + OPEN_LOOP_GAIN * FEEDBACK_BETA * f_deriv
        y = y - residual / jacobian

    return y / HEADROOM
