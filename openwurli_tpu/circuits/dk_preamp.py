"""DK-method preamp — coupled 2-stage BJT circuit as an 8-node MNA solver.

Solves the Wurlitzer 200A preamp (schematic #203720-S-3) with trapezoidal
discretisation and Newton-Raphson on the 2×2 nonlinear (Vbe) kernel.
Behaviour-parity rebuild of crates/openwurli-dsp/src/dk_preamp_legacy.rs —
the reference's shipped default solver. See the reference's
docs/research/dk-preamp-derivation.md for the derivation.

Key structure preserved:
  * R_ldr (tremolo shunt) is handled EXPLICITLY via a Sherman-Morrison
    scalar correction on the fixed S = inv(2C/T + G) matrix, so the huge
    Ce1 companion conductance stays self-consistent when R_ldr modulates.
  * Twin main + shadow solve (shadow runs zero input, producing the pure
    tremolo pump); output = main − shadow cancels all pump harmonics
    exactly without filtering.

TPU-native design: all fixed matrices are precomputed NumPy f64 constants;
the per-sample step is pure jnp, the main/shadow pair is a stacked axis of
size 2, and the whole thing broadcasts over engine-instance batch dims —
a 512-render calibration grid advances as (512, 2, 8) matvecs per sample.
The 6-iteration NR is fixed-count with convergence masking (branchless).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# ── Circuit constants (Wurlitzer 200A preamp, schematic #203720-S-3) ──
VCC = 15.0
R1 = 22_000.0      # input series R (with Cin)
R2 = 2_000_000.0   # base1 → Vcc bias
R3 = 470_000.0     # base1 → GND bias
RE1 = 33_000.0     # emit1 → GND
RC1 = 150_000.0    # coll1 → Vcc
RE2A = 270.0       # emit2 → emit2b
RE2B = 820.0       # emit2b → GND
RC2 = 1_800.0      # coll2 → Vcc
R9 = 6_800.0       # coll2 → out
R10 = 56_000.0     # out → fb

CIN = 0.022e-6     # input coupling cap (series with R1)
C3 = 100.0e-12     # Miller, stage 1 (coll1 ↔ base1)
C4 = 100.0e-12     # Miller, stage 2 (coll2 ↔ coll1)
CE1 = 4.7e-6       # feedback coupling (emit1 ↔ fb)
CE2 = 22.0e-6      # stage-2 emitter bypass

# BJT 2N5089, forward-active Ebers-Moll
IS = 3.03e-14
VT = 0.026
VBE_MAX = 0.85

# Node indices
BASE1, EMIT1, COLL1, EMIT2, EMIT2B, COLL2, OUT, FB = range(8)
N = 8

R_LDR_INIT = 1_000_000.0
NR_ITERS = 6


def _stamp_resistor(g, i, j, r):
    c = 1.0 / r
    g[i, i] += c
    g[j, j] += c
    g[i, j] -= c
    g[j, i] -= c


def _stamp_capacitor(c_mat, i, j, cap):
    c_mat[i, i] += cap
    c_mat[j, j] += cap
    c_mat[i, j] -= cap
    c_mat[j, i] -= cap


def build_g_dc():
    """Conductance matrix, grounded-element + two-node stamps (no R_ldr/Cin)."""
    g = np.zeros((N, N))
    g[BASE1, BASE1] += 1.0 / R2 + 1.0 / R3
    g[EMIT1, EMIT1] += 1.0 / RE1
    g[COLL1, COLL1] += 1.0 / RC1
    _stamp_resistor(g, EMIT2, EMIT2B, RE2A)
    g[EMIT2B, EMIT2B] += 1.0 / RE2B
    g[COLL2, COLL2] += 1.0 / RC2
    _stamp_resistor(g, COLL2, OUT, R9)
    _stamp_resistor(g, OUT, FB, R10)
    return g


def build_c_matrix():
    c = np.zeros((N, N))
    _stamp_capacitor(c, COLL1, BASE1, C3)
    _stamp_capacitor(c, COLL2, COLL1, C4)
    _stamp_capacitor(c, EMIT1, FB, CE1)
    _stamp_capacitor(c, EMIT2, EMIT2B, CE2)
    return c


def build_w_vec():
    w = np.zeros(N)
    w[BASE1] = VCC / R2
    w[COLL1] = VCC / RC1
    w[COLL2] = VCC / RC2
    return w


def _compute_k(s):
    """K = N_v S N_i for the two BJT ports (Vbe1 = b1−e1, Vbe2 = c1−e2;
    collector current exits coll, enters emit)."""
    return np.array([
        [s[BASE1, EMIT1] - s[BASE1, COLL1] - s[EMIT1, EMIT1] + s[EMIT1, COLL1],
         s[BASE1, EMIT2] - s[BASE1, COLL2] - s[EMIT1, EMIT2] + s[EMIT1, COLL2]],
        [s[COLL1, EMIT1] - s[COLL1, COLL1] - s[EMIT2, EMIT1] + s[EMIT2, COLL1],
         s[COLL1, EMIT2] - s[COLL1, COLL2] - s[EMIT2, EMIT2] + s[EMIT2, COLL2]],
    ])


def _bjt_ic_np(vbe):
    v = np.clip(vbe, -1.0, VBE_MAX)
    return IS * (np.exp(v / VT) - 1.0)


def _bjt_ic_gm_np(vbe):
    v = np.clip(vbe, -1.0, VBE_MAX)
    e = np.exp(v / VT)
    return IS * (e - 1.0), (IS / VT) * e


def full_dc_solve(r_ldr=R_LDR_INIT):
    """Quiescent operating point at a given R_ldr (NumPy, setup-time).

    100-iteration damped NR on the 2-D Vbe kernel (dk_preamp_legacy.rs:370-412).
    Returns (v_nl_dc (2,), v_dc (8,)).
    """
    g_full = build_g_dc()
    g_full[FB, FB] += 1.0 / r_ldr
    s_dc = np.linalg.inv(g_full)
    k_dc = _compute_k(s_dc)
    w = build_w_vec()
    sv = s_dc @ w
    p_dc = np.array([sv[BASE1] - sv[EMIT1], sv[COLL1] - sv[EMIT2]])

    v_nl = np.array([0.56, 0.66])
    for _ in range(100):
        ic0, gm0 = _bjt_ic_gm_np(v_nl[0])
        ic1, gm1 = _bjt_ic_gm_np(v_nl[1])
        f = np.array([
            v_nl[0] - p_dc[0] - k_dc[0, 0] * ic0 - k_dc[0, 1] * ic1,
            v_nl[1] - p_dc[1] - k_dc[1, 0] * ic0 - k_dc[1, 1] * ic1,
        ])
        if np.abs(f).max() < 1e-12:
            break
        jac = np.array([
            [1.0 - k_dc[0, 0] * gm0, -k_dc[0, 1] * gm1],
            [-k_dc[1, 0] * gm0, 1.0 - k_dc[1, 1] * gm1],
        ])
        dv = np.linalg.solve(jac, f)
        v_nl -= np.clip(dv, -2.0 * VT, 2.0 * VT)

    ic = _bjt_ic_np(v_nl)
    rhs = w.copy()
    rhs[EMIT1] += ic[0]
    rhs[COLL1] -= ic[0]
    rhs[EMIT2] += ic[1]
    rhs[COLL2] -= ic[1]
    v_dc = s_dc @ rhs
    return v_nl, v_dc


class PreampParams(NamedTuple):
    """Fixed solver matrices (all static constants — computed once)."""

    s_base: jnp.ndarray        # (8, 8) inv(2C/T + G_base), no R_ldr
    a_neg_base: jnp.ndarray    # (8, 8) 2C/T − G_base
    two_w: jnp.ndarray         # (8,)
    k: jnp.ndarray             # (2, 2) NL kernel
    s_fb_col: jnp.ndarray      # (8,) S[:, FB]
    s_fb_fb: jnp.ndarray       # scalar
    nv_sfb: jnp.ndarray        # (2,)
    sfb_ni: jnp.ndarray        # (2,)
    g_cin: jnp.ndarray
    c_cin: jnp.ndarray
    gc_1pc: jnp.ndarray
    # DC operating point at R_LDR_INIT (for init / NaN-guard reset)
    v_dc: jnp.ndarray          # (8,)
    v_nl_dc: jnp.ndarray       # (2,)
    i_nl_dc: jnp.ndarray       # (2,)


class PreampState(NamedTuple):
    """Mutable per-instance state. Main+shadow stacked on axis −2.

    v: (..., 2, 8); i_nl/v_nl: (..., 2, 2); j_cin/cin_rhs_prev: (..., 2);
    g_ldr_prev: (...) shared between the twin solves.
    """

    v: jnp.ndarray
    i_nl: jnp.ndarray
    v_nl: jnp.ndarray
    j_cin: jnp.ndarray
    cin_rhs_prev: jnp.ndarray
    g_ldr_prev: jnp.ndarray


def make_params(sample_rate) -> PreampParams:
    """Build all fixed matrices at a given (oversampled) rate."""
    sr = float(sample_rate)
    t = 1.0 / sr
    two_over_t = 2.0 / t

    alpha_cin = 2.0 * R1 * CIN * sr
    g_cin = (2.0 * CIN * sr) / (1.0 + alpha_cin)
    c_cin = (1.0 - alpha_cin) / (1.0 + alpha_cin)
    gc_1pc = g_cin * (1.0 + c_cin)

    g_base = build_g_dc()
    g_base[BASE1, BASE1] += g_cin
    c_mat = build_c_matrix()
    two_c_over_t = two_over_t * c_mat
    w = build_w_vec()

    a_base = two_c_over_t + g_base
    a_neg_base = two_c_over_t - g_base
    s_base = np.linalg.inv(a_base)
    k = _compute_k(s_base)

    s_fb_col = s_base[:, FB].copy()
    s_fb_row = s_base[FB, :].copy()
    nv_sfb = np.array([s_fb_col[BASE1] - s_fb_col[EMIT1],
                       s_fb_col[COLL1] - s_fb_col[EMIT2]])
    sfb_ni = np.array([s_fb_row[EMIT1] - s_fb_row[COLL1],
                       s_fb_row[EMIT2] - s_fb_row[COLL2]])

    v_nl_dc, v_dc = full_dc_solve(R_LDR_INIT)

    f64 = lambda x: jnp.asarray(x, dtype=jnp.float64)
    return PreampParams(
        s_base=f64(s_base),
        a_neg_base=f64(a_neg_base),
        two_w=f64(2.0 * w),
        k=f64(k),
        s_fb_col=f64(s_fb_col),
        s_fb_fb=f64(s_base[FB, FB]),
        nv_sfb=f64(nv_sfb),
        sfb_ni=f64(sfb_ni),
        g_cin=f64(g_cin),
        c_cin=f64(c_cin),
        gc_1pc=f64(gc_1pc),
        v_dc=f64(v_dc),
        v_nl_dc=f64(v_nl_dc),
        i_nl_dc=f64(_bjt_ic_np(v_nl_dc)),
    )


def init_state(params: PreampParams, batch_shape=()) -> PreampState:
    """Main and shadow both start at the DC operating point."""
    bs2 = batch_shape + (2,)
    v = jnp.broadcast_to(params.v_dc, bs2 + (N,))
    v_nl = jnp.broadcast_to(params.v_nl_dc, bs2 + (2,))
    i_nl = jnp.broadcast_to(params.i_nl_dc, bs2 + (2,))
    j_cin = jnp.broadcast_to(params.g_cin * params.v_dc[BASE1], bs2)
    return PreampState(
        v=v, i_nl=i_nl, v_nl=v_nl,
        j_cin=j_cin, cin_rhs_prev=j_cin,
        g_ldr_prev=jnp.full(batch_shape, 1.0 / R_LDR_INIT, dtype=jnp.float64),
    )


def ldr_conductance(r_ldr_path):
    """set_ldr_resistance semantics: clamp at 1 kΩ, return conductance."""
    return 1.0 / jnp.maximum(jnp.asarray(r_ldr_path, dtype=jnp.float64), 1000.0)


def _bjt_ic_gm(vbe):
    v = jnp.clip(vbe, -1.0, VBE_MAX)
    e = jnp.exp(v / VT)
    return IS * (e - 1.0), (IS / VT) * e


def step(params: PreampParams, state: PreampState, g_ldr, x):
    """One trapezoidal DK step of the twin (main, shadow) pair.

    g_ldr: (...) conductance of the tremolo shunt this sample.
    x: (...) audio input. Returns (state, out) with out = main − shadow.
    """
    g_ldr = jnp.asarray(g_ldr, dtype=jnp.float64)
    x = jnp.asarray(x, dtype=jnp.float64)
    # Inputs for (main, shadow): shadow always sees zero.
    u = jnp.stack(jnp.broadcast_arrays(x, jnp.zeros_like(x)), axis=-1)  # (...,2)

    # 1. History: rhs = A_neg_base v + sources
    rhs = jnp.einsum("ij,...j->...i", params.a_neg_base, state.v)
    glp = state.g_ldr_prev[..., None]
    rhs = rhs.at[..., FB].add(-glp * state.v[..., FB])

    cin_rhs_now = params.g_cin * u + state.j_cin
    rhs = rhs.at[..., BASE1].add(cin_rhs_now + state.cin_rhs_prev)
    rhs = rhs.at[..., EMIT1].add(state.i_nl[..., 0])
    rhs = rhs.at[..., COLL1].add(-state.i_nl[..., 0])
    rhs = rhs.at[..., EMIT2].add(state.i_nl[..., 1])
    rhs = rhs.at[..., COLL2].add(-state.i_nl[..., 1])
    rhs = rhs + params.two_w

    # 2. Predictor without R_ldr on the LHS
    v_pred_base = jnp.einsum("ij,...j->...i", params.s_base, rhs)

    # 3. Sherman-Morrison correction for the current R_ldr
    sm_k = g_ldr / (1.0 + params.s_fb_fb * g_ldr)  # (...)
    sm_k2 = sm_k[..., None]  # broadcast over (main, shadow)
    v_pred = v_pred_base - (sm_k2 * v_pred_base[..., FB])[..., None] * params.s_fb_col

    # 4. Predicted NL port voltages
    p = jnp.stack(
        [v_pred[..., BASE1] - v_pred[..., EMIT1],
         v_pred[..., COLL1] - v_pred[..., EMIT2]], axis=-1)

    # 5. R_ldr-corrected kernel + fixed-count masked NR
    k_corr = params.k - sm_k[..., None, None] * (
        params.nv_sfb[:, None] * params.sfb_ni[None, :])
    k_corr = k_corr[..., None, :, :]  # (...,1,2,2) over (main, shadow)
    k00, k01 = k_corr[..., 0, 0], k_corr[..., 0, 1]
    k10, k11 = k_corr[..., 1, 0], k_corr[..., 1, 1]

    v_nl = state.v_nl
    for _ in range(NR_ITERS):
        ic0, gm0 = _bjt_ic_gm(v_nl[..., 0])
        ic1, gm1 = _bjt_ic_gm(v_nl[..., 1])
        f0 = v_nl[..., 0] - p[..., 0] - k00 * ic0 - k01 * ic1
        f1 = v_nl[..., 1] - p[..., 1] - k10 * ic0 - k11 * ic1
        j00 = 1.0 - k00 * gm0
        j01 = -k01 * gm1
        j10 = -k10 * gm0
        j11 = 1.0 - k11 * gm1
        det = j00 * j11 - j01 * j10
        converged = (jnp.abs(f0) < 1e-9) & (jnp.abs(f1) < 1e-9)
        ok = (~converged) & (jnp.abs(det) > 1e-30)
        inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
        dv0 = inv_det * (j11 * f0 - j01 * f1)
        dv1 = inv_det * (j00 * f1 - j10 * f0)
        v_nl = jnp.stack(
            [v_nl[..., 0] - jnp.where(ok, dv0, 0.0),
             v_nl[..., 1] - jnp.where(ok, dv1, 0.0)], axis=-1)

    # 6-7. Final NL currents + node update
    ic_new = jnp.stack([_bjt_ic_gm(v_nl[..., 0])[0],
                        _bjt_ic_gm(v_nl[..., 1])[0]], axis=-1)
    s_ni = (ic_new[..., 0:1]
            * (params.s_base[:, EMIT1] - params.s_base[:, COLL1])
            + ic_new[..., 1:2]
            * (params.s_base[:, EMIT2] - params.s_base[:, COLL2]))
    sfb_ni_dot_ic = (params.sfb_ni[0] * ic_new[..., 0]
                     + params.sfb_ni[1] * ic_new[..., 1])
    v_new = v_pred + s_ni - (sm_k2 * sfb_ni_dot_ic)[..., None] * params.s_fb_col

    # 8. Cin-R1 companion update
    dv_cin = u - v_new[..., BASE1]
    j_cin = -params.gc_1pc * dv_cin - params.c_cin * state.j_cin

    out = v_new[..., 0, OUT] - v_new[..., 1, OUT]  # main − shadow

    # NaN guard: masked reset to the stored DC OP; output silence there.
    bad = ~jnp.isfinite(out)
    bad2 = bad[..., None]
    new_state = PreampState(
        v=jnp.where(bad2[..., None], params.v_dc, v_new),
        i_nl=jnp.where(bad2[..., None], params.i_nl_dc, ic_new),
        v_nl=jnp.where(bad2[..., None], params.v_nl_dc, v_nl),
        j_cin=jnp.where(bad2, params.g_cin * params.v_dc[BASE1], j_cin),
        cin_rhs_prev=jnp.where(bad2, params.g_cin * params.v_dc[BASE1],
                               cin_rhs_now),
        g_ldr_prev=g_ldr,
    )
    return new_state, jnp.where(bad, 0.0, out)
