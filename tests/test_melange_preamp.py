"""12-node melange-variant preamp tests — the reference's cross-solver gates.

Gates from dk_preamp/mod.rs:23-445: melange-vs-legacy gain within 2 dB at
both R_ldr endpoints, no LDR-sweep clicks, plus noise on/off behaviour.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openwurli_tpu.circuits import dk_preamp as dk, melange_preamp as mp

pytestmark = pytest.mark.slow  # multi-minute end-to-end renders on 1-core CPU

SR = 88200.0


@functools.lru_cache(maxsize=None)
def _params():
    return mp.make_params(SR)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _run(st, g, xs, noise=False, gain=1.0):
    params = _params()

    def body(s, x):
        return mp.step(params, s, g, x, noise_enabled=noise, noise_gain=gain)

    return jax.lax.scan(body, st, xs)


def _gain(r_ldr, freq=1000.0, amp=0.001, settle=1.0):
    # Settle ≥ 2.5 τ of the Ce1 feedback path (τ ≈ 0.35 s at bright LDR):
    # an unsettled bias was most of the old 2.4 dB cross-solver gap.
    params = _params()
    n = int(SR * (settle + 0.2))
    t = np.arange(n) / SR
    xs = jnp.asarray(amp * np.sin(2 * np.pi * freq * t))
    _, out = _run(mp.init_state(params), dk.ldr_conductance(r_ldr), xs)
    seg = np.asarray(out)[int(SR * settle):]
    return (seg.max() - seg.min()) / 2 / amp


def _legacy_gain(r_ldr, freq=1000.0, amp=0.001, settle=1.0):
    params = dk.make_params(SR)
    state = dk.init_state(params)
    g = dk.ldr_conductance(r_ldr)
    n = int(SR * (settle + 0.2))
    t = np.arange(n) / SR
    xs = jnp.asarray(amp * np.sin(2 * np.pi * freq * t))

    @jax.jit
    def run(state, xs):
        def body(st, x):
            return dk.step(params, st, g, x)

        return jax.lax.scan(body, state, xs)

    _, out = run(state, xs)
    seg = np.asarray(out)[int(SR * settle):]
    return (seg.max() - seg.min()) / 2 / amp


def test_gain_matches_legacy_at_both_endpoints():
    # Cross-solver gate at the reference's 2 dB (dk_preamp/mod.rs:101-117).
    # Measured delta is ~0.45 dB at BOTH endpoints once the melange DC
    # operating point includes the R_ldr branch's DC loading (the
    # reference bakes it, gen_preamp.rs DC_OP) and the bias is allowed to
    # settle through Ce1; the residual is the full Gummel-Poon's base
    # current + IKF physics vs the legacy ideal Ebers-Moll.
    for r_ldr in (1_000_000.0, 19_000.0):
        g_mel = 20 * np.log10(_gain(r_ldr))
        g_leg = 20 * np.log10(_legacy_gain(r_ldr))
        assert abs(g_mel - g_leg) < 2.0, (r_ldr, g_mel, g_leg)


def test_gain_increases_with_tremolo():
    assert _gain(19_000.0) > _gain(1_000_000.0) * 1.2


def test_gain_matches_reference_spice_deck_targets():
    """Independent oracle: the reference's OWN ngspice deck target
    (spice/testbench/tb_preamp_ac.cir:13-14 — closed-loop gain ~5.6×
    (15 dB) at 1 kHz with R_ldr = 12k), not a value computed by this
    repo's solvers. Measured 14.6 dB. Tolerance = the reference's 2 dB
    cross-solver gate + 0.5 dB measurement slop. (The deck's '−3 dB
    bandwidth ~3.7 kHz' line is relative to the band-passed response
    peak under that deck's exact source/load network — the C20 HPF
    corner sits at 1.9 kHz, above the 1 kHz reference tone — so it has
    no two-point replication here; our 3.7 kHz response sits 0.6 dB
    below the 1 kHz gain, i.e. the same gentle upper shoulder.)"""
    g_mid = 20 * np.log10(_gain(12_000.0, freq=1000.0))
    assert abs(g_mid - 15.0) < 2.5, f"1 kHz gain {g_mid:.2f} dB vs 15 dB"


def test_ldr_sweep_no_clicks():
    # Sweep R_ldr smoothly; inter-sample jumps must stay bounded
    # (dk_preamp/mod.rs:125-172 click detector).
    params = _params()
    n = int(SR * 0.3)
    t = np.arange(n) / SR
    r = np.exp(np.log(1e6) + (np.log(1.9e4) - np.log(1e6))
               * 0.5 * (1 - np.cos(2 * np.pi * 5.5 * t)))
    xs = jnp.asarray(0.002 * np.sin(2 * np.pi * 440.0 * t))
    state = mp.init_state(params)

    @jax.jit
    def run(st, rs, xs):
        def body(s, rx):
            return mp.step(params, s, dk.ldr_conductance(rx[0]), rx[1])

        return jax.lax.scan(body, st, (rs, xs))

    _, out = run(state, jnp.asarray(r), xs)
    o = np.asarray(out)[int(SR * 0.1):]
    jumps = np.abs(np.diff(o))
    # Threshold: many times the max slew of the underlying sine at the
    # bright-gain endpoint.
    max_sine_slew = 0.002 * 6.6 * 2 * np.pi * 440.0 / SR
    assert jumps.max() < 12.0 * max_sine_slew, jumps.max()


def test_noise_off_is_silent_and_on_is_not():
    params = _params()
    g = dk.ldr_conductance(1_000_000.0)
    n = int(SR * 0.25)
    xs = jnp.zeros(n)
    _, out_off = _run(mp.init_state(params), g, xs, False, 1.0)
    _, out_on = _run(mp.init_state(params), g, xs, True, 1.0)
    rms_off = float(jnp.sqrt(jnp.mean(out_off[n // 2:] ** 2)))
    seg = np.asarray(out_on)[n // 2:]
    rms_on = float(np.sqrt(((seg - seg.mean()) ** 2).mean()))
    assert rms_off < 1e-9, rms_off
    assert 3e-6 < rms_on < 2e-5, rms_on  # dark-LDR point, short window


def test_noise_level_matches_ngspice_anchor():
    """Output noise RMS vs the reference's VALIDATED level: the
    reference's `1.0×` thermal gain is ngspice-validated at **8.08 µV**
    at the raw preamp output, 88.2 kHz (reference CHANGELOG.md:479-488,
    superseding the earlier ~34 µV analytic target of
    dk_preamp/mod.rs:332) at the nominal LDR point (R_ldr = 1/POT_0_G_NOM
    = 100 kΩ, gen_preamp.rs:1426-1431). Welford-equivalent single-state
    measurement (dk_preamp/mod.rs:337-445 method B). Measured here:
    7.54 µV (−7 %); the ±35 % band fails on any mis-scaled noise stamp
    (a wrong sqrt, kT factor, or per-resistor sigma) while tolerating
    window-length variance."""
    params = _params()
    g = dk.ldr_conductance(100_000.0)
    n = int(SR * 1.0)
    xs = jnp.zeros(n)
    _, out = _run(mp.init_state(params), g, xs, True, 1.0)
    seg = np.asarray(out)[n // 3:]
    rms = float(np.sqrt(((seg - seg.mean()) ** 2).mean()))
    assert 8.08e-6 * 0.65 < rms < 8.08e-6 * 1.35, rms


def test_noise_gain_scales():
    params = _params()
    g = dk.ldr_conductance(1_000_000.0)
    n = int(SR * 0.2)
    xs = jnp.zeros(n)
    _, out1 = _run(mp.init_state(params), g, xs, True, 1.0)
    _, out4 = _run(mp.init_state(params), g, xs, True, 4.0)

    def rms(o):
        seg = np.asarray(o)[n // 2:]
        return np.sqrt(((seg - seg.mean()) ** 2).mean())

    ratio = rms(out4) / rms(out1)
    assert 3.0 < ratio < 5.3, ratio


def test_dc_operating_point_sane():
    params = _params()
    v = np.asarray(params.solver.v_dc)
    nl = mp._cached_netlist()
    idx = nl._nodes
    # Same bias structure as the 8-node model: Vbe ~0.5-0.7, coll2 ~7-10 V.
    vbe1 = v[idx["base1"]] - v[idx["emit1"]]
    assert 0.4 < vbe1 < 0.75, vbe1
    assert 6.0 < v[idx["coll2"]] < 11.0, v[idx["coll2"]]
