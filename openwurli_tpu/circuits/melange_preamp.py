"""12-node preamp variant — full Gummel-Poon + protection diode + noise.

The reference ships two preamp solvers behind a cargo feature: the default
hand-written 8-node model (our circuits/dk_preamp) and the melange-generated
12-node solver with full 2N5089 Gummel-Poon, a 1N4148 protection diode, and
Johnson-Nyquist thermal noise (gen_preamp.rs). This module is the 12-node
variant, built on the generic MNA solver from the same netlist
(spice/melange/wurli-preamp.cir).

TPU-first improvement over the generated solver: the tremolo LDR is handled
by a Sherman-Morrison rank-1 correction on the fixed factorised system
(like the reference's 8-node solver) instead of the generated code's
lazy per-sample matrix rebuild — same circuit, O(N) instead of O(N³) per
R_ldr change.

Twin main+shadow solve with pump subtraction, as in both reference paths.
Thermal noise: per-resistor Johnson current noise with the reference's
two-draw trapezoidal stamp (physical 4kT/R PSD, Nyquist-zeroed), injected
on the main solver only, with a runtime gain (the plugin's "Authentic
Noise" / "Noise Level" params).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from openwurli_tpu.circuits import mna

K_BOLTZMANN = 1.380649e-23
TEMP_K = 290.0  # reference gen_preamp T_ROOM_K
R_LDR_INIT = 1_000_000.0
NR_MAX_ITER = 12


def build_netlist() -> mna.Netlist:
    """spice/melange/wurli-preamp.cir WITHOUT R_ldr (handled via SM)."""
    nl = mna.Netlist()
    q2n5089 = mna.BjtModel(
        is_=3.03e-14, bf=1434.0, nf=1.005, vaf=98.5, ikf=0.01358,
        ise=2.88e-15, ne=1.262, br=4.62, nr=1.0, var=22.0, ikr=0.1,
        isc=1.065e-11, nc=1.41, cje=3.22e-12, cjc=1.35e-12)
    d1n4148 = mna.DiodeModel(is_=2.52e-9, n=1.752)

    nl.r("in", "mid_in", 22e3)
    nl.c("in", "0", 1e-12)
    nl.c("mid_in", "base1", 0.022e-6)
    nl.r("vcc", "base1", 2e6)
    nl.r("base1", "0", 470e3)
    nl.diode("D1", "0", "base1", d1n4148)
    nl.bjt("Q1", "coll1", "base1", "emit1", q2n5089)
    nl.r("vcc", "coll1", 150e3)
    nl.r("emit1", "0", 33e3)
    nl.c("emit1", "fb", 4.7e-6)
    nl.c("coll1", "base1", 100e-12)
    nl.bjt("Q2", "coll2", "coll1", "emit2a", q2n5089)
    nl.r("vcc", "coll2", 1.8e3)
    nl.r("emit2a", "emit2b", 270.0)
    nl.c("emit2a", "emit2b", 22e-6)
    nl.r("emit2b", "0", 820.0)
    nl.c("coll2", "coll1", 100e-12)
    nl.r("coll2", "out", 6.8e3)
    nl.r("out", "fb", 56e3)
    nl.v("V1", "vcc", "0", 15.0)
    nl.set_input("in")
    return nl


@lru_cache(maxsize=None)
def _cached_netlist():
    return build_netlist()


class MelangePreampParams(NamedTuple):
    solver: mna.SolverParams
    fb_idx: int
    out_idx: int
    input_row: int
    sample_rate: float
    # Sherman-Morrison projections for the explicit R_ldr on node fb
    s_fb_col: jnp.ndarray  # (n,)
    s_fb_fb: jnp.ndarray
    nv_sfb: jnp.ndarray  # (M,)
    sfb_ni: jnp.ndarray  # (M,)
    # Thermal noise: injection matrix (n, n_res) and per-resistor sigma
    noise_inject: jnp.ndarray  # (n, n_res)
    noise_sigma: jnp.ndarray  # (n_res,)


class MelangePreampState(NamedTuple):
    """Twin (main, shadow) stacked on axis -2 of each leaf."""

    v: jnp.ndarray        # (..., 2, n)
    i_nl: jnp.ndarray     # (..., 2, M)
    v_nl: jnp.ndarray     # (..., 2, M)
    g_ldr_prev: jnp.ndarray  # (...,)
    noise_key: jnp.ndarray   # (..., 2) uint32 jax PRNG key data
    noise_w_prev: jnp.ndarray  # (..., n_res) previous thermal draws


@lru_cache(maxsize=None)
def make_params(sample_rate) -> MelangePreampParams:
    nl = _cached_netlist()
    # DC operating point WITH the R_ldr branch: at DC the LDR path loads
    # the output through R10 (the reference's baked DC_OP includes it,
    # gen_preamp.rs:1568-1583 — its fb sits at the out·R_ldr/(R10+R_ldr)
    # divider). The runtime matrices stay LDR-free (Sherman-Morrison).
    nl_dc = build_netlist()
    nl_dc.r("fb", "0", R_LDR_INIT)
    v_dc, i_dc, v_nl_dc = mna.dc_solve(nl_dc)
    solver = mna.make_solver_params(nl, sample_rate, integrator="trap",
                                    v_dc=v_dc, i_dc=i_dc,
                                    v_nl_dc=v_nl_dc)
    asm = nl.assemble()
    fb = nl._nodes["fb"]
    s = np.asarray(solver.s)
    n_v, n_i = asm["n_v"], asm["n_i"]
    s_fb_col = s[:, fb]
    s_fb_row = s[fb, :]

    # Johnson noise: one current-noise source per physical resistor,
    # injected across its nodes with the reference's two-draw trapezoidal
    # stamp (gen_preamp.rs:3434-3450): per-sample draw
    # w = 0.5*sqrt(8 kB T fs)*sqrt(1/R)*N(0,1); injected i_n = w[n]+w[n-1]
    # — the (w[n]+w[n-1]) pairing is the trapezoidal source average, giving
    # a physically-correct 4kT/R one-sided PSD with a Nyquist zero.
    injects, sigmas = [], []
    scale_half = 0.5 * np.sqrt(8.0 * K_BOLTZMANN * TEMP_K * sample_rate)
    for n1, n2, ohms in nl.resistors:
        col = np.zeros(asm["n"])
        if n1 >= 0:
            col[n1] += 1.0
        if n2 >= 0:
            col[n2] -= 1.0
        injects.append(col)
        sigmas.append(scale_half * np.sqrt(1.0 / ohms))

    f64 = lambda x: jnp.asarray(x, dtype=jnp.float64)
    return MelangePreampParams(
        solver=solver,
        fb_idx=fb,
        out_idx=nl._nodes["out"],
        input_row=asm["input_row"],
        sample_rate=float(sample_rate),
        s_fb_col=f64(s_fb_col),
        s_fb_fb=f64(s[fb, fb]),
        nv_sfb=f64(n_v @ s_fb_col),
        sfb_ni=f64(s_fb_row @ n_i),
        noise_inject=f64(np.stack(injects, axis=1)),
        noise_sigma=f64(np.asarray(sigmas)),
    )


def init_state(params: MelangePreampParams, batch_shape=(),
               seed=0x5EED) -> MelangePreampState:
    bs2 = batch_shape + (2,)
    sp = params.solver
    return MelangePreampState(
        v=jnp.broadcast_to(sp.v_dc, bs2 + sp.v_dc.shape),
        i_nl=jnp.broadcast_to(sp.i_dc, bs2 + sp.i_dc.shape),
        v_nl=jnp.broadcast_to(sp.v_nl_dc, bs2 + sp.v_nl_dc.shape),
        g_ldr_prev=jnp.full(batch_shape, 1.0 / R_LDR_INIT,
                            dtype=jnp.float64),
        noise_key=jnp.broadcast_to(
            jax.random.PRNGKey(seed).astype(jnp.uint32),
            batch_shape + (2,)).astype(jnp.uint32),
        noise_w_prev=jnp.zeros(
            batch_shape + (params.noise_sigma.shape[0],),
            dtype=jnp.float64),
    )


def step(params: MelangePreampParams, state: MelangePreampState, g_ldr, x,
         noise_enabled=False, noise_gain=1.0):
    """One trapezoidal step of the twin pair; out = main − shadow.

    g_ldr: (...) conductance of the tremolo shunt (explicit via SM).
    Noise (when enabled) is injected on the main solver only, matching the
    reference (melange_adapter.rs:54-57).
    """
    nl = _cached_netlist()
    sp = params.solver
    dev_fn = nl.device_current_fn()
    dev_jac = nl.device_jacobian_fn()
    m = int(sp.k.shape[0])

    g_ldr = jnp.asarray(g_ldr, dtype=jnp.float64)
    x = jnp.asarray(x, dtype=jnp.float64)
    u = jnp.stack(jnp.broadcast_arrays(x, jnp.zeros_like(x)), axis=-1)

    # Thermal noise currents (main solve only).
    key = state.noise_key
    new_key, sub = jax.random.split(jax.random.wrap_key_data(
        key, impl="threefry2x32"))
    noise = jax.random.normal(sub, key.shape[:-1]
                              + (params.noise_sigma.shape[0],),
                              dtype=jnp.float64)
    scale = jnp.asarray(noise_enabled, jnp.float64) * noise_gain
    w_new = noise * params.noise_sigma * scale
    i_r = w_new + state.noise_w_prev  # two-draw trapezoidal stamp
    i_noise = jnp.einsum("nr,...r->...n", params.noise_inject, i_r)
    # (..., n) → only on main (index 0 of the twin axis)
    i_noise2 = jnp.stack([i_noise, jnp.zeros_like(i_noise)], axis=-2)

    # History rhs (trapezoidal) + explicit R_ldr backward term on fb.
    rhs = jnp.einsum("ij,...j->...i", sp.a_hist, state.v)
    rhs = rhs.at[..., params.fb_idx].add(
        -state.g_ldr_prev[..., None] * state.v[..., params.fb_idx])
    rhs = rhs + sp.w_scale * sp.w
    # Input constraint row is algebraic: v_in[n] = u[n].
    rhs = rhs.at[..., params.input_row].add(u)
    rhs = rhs + jnp.einsum("im,...m->...i", sp.n_i, state.i_nl)
    rhs = rhs + i_noise2

    v_pred_base = jnp.einsum("ij,...j->...i", sp.s, rhs)

    sm_k = g_ldr / (1.0 + params.s_fb_fb * g_ldr)
    sm_k2 = sm_k[..., None]
    v_pred = v_pred_base - (sm_k2 * v_pred_base[..., params.fb_idx])[
        ..., None] * params.s_fb_col

    p = jnp.einsum("mi,...i->...m", sp.n_v, v_pred)
    k_corr = sp.k - sm_k[..., None, None, None] * (
        params.nv_sfb[:, None] * params.sfb_ni[None, :])

    v_nl = state.v_nl
    for _ in range(NR_MAX_ITER):
        i_nl = dev_fn(v_nl)
        f = v_nl - p - jnp.einsum("...ij,...j->...i", k_corr, i_nl)
        jdev = dev_jac(v_nl)
        jac = jnp.eye(m) - jnp.einsum("...ij,...jk->...ik", k_corr, jdev)
        dv = mna.ge_solve_f32(jac, f)
        conv = jnp.max(jnp.abs(f), axis=-1, keepdims=True) < 1e-9
        v_nl = v_nl - jnp.where(conv, 0.0, jnp.clip(dv, -0.5, 0.5))

    i_new = dev_fn(v_nl)
    s_ni_i = jnp.einsum("im,...m->...i", sp.s_ni, i_new)
    sfb_dot = jnp.einsum("m,...m->...", params.sfb_ni, i_new)
    v_new = v_pred + s_ni_i - (sm_k2 * sfb_dot)[..., None] * params.s_fb_col

    out = v_new[..., 0, params.out_idx] - v_new[..., 1, params.out_idx]

    bad = ~jnp.isfinite(out)
    b2 = bad[..., None, None]
    new_state = MelangePreampState(
        v=jnp.where(b2, sp.v_dc, v_new),
        i_nl=jnp.where(b2, sp.i_dc, i_new),
        v_nl=jnp.where(b2, sp.v_nl_dc, v_nl),
        g_ldr_prev=g_ldr,
        noise_key=jax.random.key_data(new_key).astype(jnp.uint32),
        noise_w_prev=w_new,
    )
    return new_state, jnp.where(bad, 0.0, out)
