"""DK preamp tests — the reference's 5-layer test pyramid, ported.

L1: matrix stamps vs hand values. L2: linear-algebra identities incl.
Sherman-Morrison vs brute-force re-inversion. L3: DC operating point vs
SPICE ground truth, SR-independent. L4: analytical small-signal transfer
function from an independent complex solver. L5: behavioral (NR
convergence, tremolo gain, stability, H2).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openwurli_tpu.circuits import dk_preamp as dk
from openwurli_tpu.circuits.dk_preamp import (
    BASE1, COLL1, COLL2, EMIT1, EMIT2, EMIT2B, FB, N, OUT,
)

pytestmark = pytest.mark.slow  # multi-minute end-to-end renders on 1-core CPU

SR = 88200.0


@functools.lru_cache(maxsize=None)
def _params(sr=SR):
    return dk.make_params(sr)


@functools.partial(jax.jit, static_argnums=())
def _run(params, state, g_ldr, xs):
    def body(st, x):
        return dk.step(params, st, g_ldr, x)

    return jax.lax.scan(body, state, xs)


def _measure_gain(freq, amplitude, r_ldr, sr=SR, settle=0.3, measure=0.2):
    params = _params(sr)
    state = dk.init_state(params)
    g = dk.ldr_conductance(r_ldr)
    n1, n2 = int(sr * settle), int(sr * measure)
    t = np.arange(n1 + n2) / sr
    xs = jnp.asarray(amplitude * np.sin(2 * np.pi * freq * t))
    _, out = _run(params, state, g, xs)
    peak = float(jnp.abs(out[n1:]).max())
    return peak / amplitude


# ── L1: matrix stamps ────────────────────────────────────────────────────


def test_l1_g_diagonal_stamps():
    g = dk.build_g_dc()
    eps = 1e-12
    assert abs(g[BASE1, BASE1] - (1 / dk.R2 + 1 / dk.R3)) < eps
    assert abs(g[EMIT1, EMIT1] - 1 / dk.RE1) < eps
    assert abs(g[COLL1, COLL1] - 1 / dk.RC1) < eps
    assert abs(g[EMIT2, EMIT2] - 1 / dk.RE2A) < eps
    assert abs(g[EMIT2B, EMIT2B] - (1 / dk.RE2A + 1 / dk.RE2B)) < eps
    assert abs(g[COLL2, COLL2] - (1 / dk.RC2 + 1 / dk.R9)) < eps
    assert abs(g[OUT, OUT] - (1 / dk.R9 + 1 / dk.R10)) < eps
    assert abs(g[FB, FB] - 1 / dk.R10) < eps


def test_l1_g_off_diagonal_stamps():
    g = dk.build_g_dc()
    eps = 1e-12
    assert abs(g[EMIT2, EMIT2B] + 1 / dk.RE2A) < eps
    assert abs(g[COLL2, OUT] + 1 / dk.R9) < eps
    assert abs(g[OUT, FB] + 1 / dk.R10) < eps
    connected = {(EMIT2, EMIT2B), (EMIT2B, EMIT2), (COLL2, OUT),
                 (OUT, COLL2), (OUT, FB), (FB, OUT)}
    for i in range(N):
        for j in range(N):
            if i != j and (i, j) not in connected:
                assert abs(g[i, j]) < eps, (i, j)


def test_l1_c_matrix_stamps():
    c = dk.build_c_matrix()
    eps = 1e-15
    assert abs(c[BASE1, BASE1] - dk.C3) < eps
    assert abs(c[EMIT1, EMIT1] - dk.CE1) < eps
    assert abs(c[COLL1, COLL1] - (dk.C3 + dk.C4)) < eps
    assert abs(c[COLL2, COLL2] - dk.C4) < eps
    assert abs(c[OUT, OUT]) < eps
    assert abs(c[FB, FB] - dk.CE1) < eps
    assert abs(c[BASE1, COLL1] + dk.C3) < eps
    assert abs(c[EMIT1, FB] + dk.CE1) < eps
    np.testing.assert_allclose(c, c.T, atol=1e-20)


def test_l1_dc_source_vector():
    w = dk.build_w_vec()
    assert abs(w[BASE1] - dk.VCC / dk.R2) < 1e-12
    assert abs(w[COLL1] - dk.VCC / dk.RC1) < 1e-12
    assert abs(w[COLL2] - dk.VCC / dk.RC2) < 1e-12
    assert np.abs(np.delete(w, [BASE1, COLL1, COLL2])).max() < 1e-12


# ── L2: linear-algebra identities ────────────────────────────────────────


def test_l2_s_base_inverse_identity():
    params = _params()
    t = 1.0 / SR
    g = dk.build_g_dc()
    alpha_cin = 2.0 * dk.R1 * dk.CIN * SR
    g[BASE1, BASE1] += (2.0 * dk.CIN * SR) / (1.0 + alpha_cin)
    a = (2.0 / t) * dk.build_c_matrix() + g
    product = np.asarray(params.s_base) @ a
    np.testing.assert_allclose(product, np.eye(N), atol=1e-9)


def test_l2_sherman_morrison_vs_reinversion():
    # SM-corrected solve must match brute-force inverse with R_ldr stamped.
    params = _params()
    t = 1.0 / SR
    g = dk.build_g_dc()
    alpha_cin = 2.0 * dk.R1 * dk.CIN * SR
    g[BASE1, BASE1] += (2.0 * dk.CIN * SR) / (1.0 + alpha_cin)
    a_base = (2.0 / t) * dk.build_c_matrix() + g

    rng = np.random.default_rng(0)
    rhs = rng.normal(size=N)
    for r_ldr in [19_000.0, 100_000.0, 1_000_000.0]:
        g_ldr = 1.0 / r_ldr
        a_full = a_base.copy()
        a_full[FB, FB] += g_ldr
        brute = np.linalg.solve(a_full, rhs)

        s = np.asarray(params.s_base)
        v_pred_base = s @ rhs
        sm_k = g_ldr / (1.0 + s[FB, FB] * g_ldr)
        sm = v_pred_base - sm_k * v_pred_base[FB] * s[:, FB]
        np.testing.assert_allclose(sm, brute, rtol=1e-9)


# ── L3: DC operating point ───────────────────────────────────────────────


def test_l3_dc_operating_point_vs_spice():
    # SPICE ground truth (ideal BJT, R_ldr=1M): dk_preamp_legacy.rs:906-909
    _, v = dk.full_dc_solve(1_000_000.0)
    assert abs(v[BASE1] - 2.854) < 0.1
    assert abs(v[EMIT1] - 2.297) < 0.1
    assert abs(v[COLL1] - 4.556) < 0.5
    assert abs(v[EMIT2] - 3.897) < 0.5
    assert abs(v[COLL2] - 8.551) < 1.0
    vbe1 = v[BASE1] - v[EMIT1]
    vbe2 = v[COLL1] - v[EMIT2]
    assert 0.45 < vbe1 < 0.70
    assert 0.55 < vbe2 < 0.75


def test_l3_dc_independent_of_sample_rate():
    # DC solve has no T in it; but the params built at different rates must
    # store identical operating points.
    p1 = dk.make_params(44100.0)
    p2 = dk.make_params(96000.0)
    np.testing.assert_allclose(np.asarray(p1.v_dc), np.asarray(p2.v_dc),
                               atol=1e-12)


# ── L4: small-signal transfer function (independent complex solver) ──────


def _small_signal_gain_db(gm1, gm2, r_ldr, freq_hz):
    """Continuous-time linearised gain from an independent complex solve."""
    omega = 2.0 * np.pi * freq_hz
    jw = 1j * omega
    g = dk.build_g_dc().astype(complex)
    g[FB, FB] += 1.0 / r_ldr
    # VCCS stamps: Ic enters emitter, leaves collector
    g[EMIT1, BASE1] += gm1
    g[EMIT1, EMIT1] -= gm1
    g[COLL1, BASE1] -= gm1
    g[COLL1, EMIT1] += gm1
    g[EMIT2, COLL1] += gm2
    g[EMIT2, EMIT2] -= gm2
    g[COLL2, COLL1] -= gm2
    g[COLL2, EMIT2] += gm2

    y_cin = (jw * dk.CIN) / (1.0 + jw * dk.R1 * dk.CIN)
    a = jw * dk.build_c_matrix() + g
    a[BASE1, BASE1] += y_cin
    b = np.zeros(N, dtype=complex)
    b[BASE1] = y_cin
    v = np.linalg.solve(a, b)
    return 20.0 * np.log10(abs(v[OUT]))


def _dc_gms(r_ldr):
    v_nl, _ = dk.full_dc_solve(r_ldr)
    return [dk._bjt_ic_gm_np(v)[1] for v in v_nl]


def test_l4_midband_gain_and_tremolo_range():
    gm1, gm2 = _dc_gms(1_000_000.0)
    g_dark = _small_signal_gain_db(gm1, gm2, 1_000_000.0, 1000.0)
    assert 3.0 < g_dark < 12.0, f"dark-LDR midband gain {g_dark:.1f} dB"

    gm1b, gm2b = _dc_gms(19_000.0)
    g_bright = _small_signal_gain_db(gm1b, gm2b, 19_000.0, 1000.0)
    assert g_bright > g_dark + 1.5, (g_bright, g_dark)


def test_l4_bandwidth():
    gm1, gm2 = _dc_gms(1_000_000.0)
    ref = _small_signal_gain_db(gm1, gm2, 1_000_000.0, 1000.0)
    lo, hi = 1000.0, 200_000.0
    for _ in range(60):
        mid = (lo * hi) ** 0.5
        if _small_signal_gain_db(gm1, gm2, 1_000_000.0, mid) > ref - 3.0:
            lo = mid
        else:
            hi = mid
    bw = (lo * hi) ** 0.5
    assert 8_000.0 < bw < 40_000.0, f"bandwidth {bw:.0f} Hz (expect ~15.5 kHz)"


def test_l4_solver_matches_analytic_gain():
    # The time-domain NR solver at small signal must match the linearised
    # transfer function within ~1 dB.
    gm1, gm2 = _dc_gms(1_000_000.0)
    analytic_db = _small_signal_gain_db(gm1, gm2, 1_000_000.0, 1000.0)
    measured = _measure_gain(1000.0, 0.001, 1_000_000.0)
    measured_db = 20.0 * np.log10(measured)
    assert abs(measured_db - analytic_db) < 1.0, (measured_db, analytic_db)


# ── L5: behavioral ───────────────────────────────────────────────────────


def test_gain_no_tremolo():
    gain_db = 20.0 * np.log10(_measure_gain(1000.0, 0.001, 1_000_000.0))
    assert 3.0 < gain_db < 12.0, f"{gain_db:.1f} dB, want ~6"


def test_gain_increases_with_tremolo():
    g_dark = _measure_gain(1000.0, 0.001, 1_000_000.0)
    g_bright = _measure_gain(1000.0, 0.001, 19_000.0)
    assert g_bright > g_dark * 1.2


def test_h2_dominates():
    params = _params()
    state = dk.init_state(params)
    freq = 440.0
    n = int(SR * 0.3)
    t = np.arange(n) / SR
    xs = jnp.asarray(0.005 * np.sin(2 * np.pi * freq * t))
    _, out = _run(params, state, dk.ldr_conductance(1_000_000.0), xs)
    seg = np.asarray(out)[n * 3 // 4:]
    ph = 2 * np.pi * np.arange(len(seg)) / SR

    def mag(f):
        return np.hypot((seg * np.cos(ph * f)).mean(),
                        (seg * np.sin(ph * f)).mean())

    h2, h3 = mag(2 * freq), mag(3 * freq)
    if h3 > 1e-15:
        assert h2 > h3


def test_stability_after_impulse():
    params = _params()
    state = dk.init_state(params)
    g = dk.ldr_conductance(1_000_000.0)
    xs = jnp.concatenate([jnp.array([0.01]),
                          jnp.zeros(int(SR * 2.0))])
    _, out = _run(params, state, g, xs)
    assert abs(float(out[-1])) < 1e-3


def test_bandwidth_rolloff_time_domain():
    g1k = _measure_gain(1000.0, 0.001, 1_000_000.0)
    g15k = _measure_gain(15000.0, 0.001, 1_000_000.0)
    assert g15k < g1k


def test_batched_instances():
    # Two independent instances with different R_ldr in one batched solve.
    params = _params()
    state = dk.init_state(params, batch_shape=(2,))
    g = jnp.stack([dk.ldr_conductance(1_000_000.0),
                   dk.ldr_conductance(19_000.0)])
    n = int(SR * 0.2)
    t = np.arange(n) / SR
    sine = 0.001 * np.sin(2 * np.pi * 1000.0 * t)
    xs = jnp.asarray(np.stack([sine, sine], axis=1))
    _, out = _run(params, state, g, xs)
    out = np.asarray(out)
    peak_dark = np.abs(out[n // 2:, 0]).max()
    peak_bright = np.abs(out[n // 2:, 1]).max()
    assert peak_bright > peak_dark * 1.2
