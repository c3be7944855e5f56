"""Reed oscillator, hammer, pickup, and voice tests.

Ports of the reference physics invariants (reed.rs / hammer.rs / pickup.rs /
voice.rs tests), with render lengths trimmed where the assertion allows —
these run on a 1-core CPU in CI.
"""

import jax
import jax.numpy as jnp
import numpy as np

from openwurli_tpu import hammer, pickup, reed, voice
from openwurli_tpu.ops import biquad
from openwurli_tpu.tables import NUM_MODES

SR = 44100.0
RATIOS = jnp.array([1.0, 6.267, 17.547, 34.386, 56.842, 85.1, 119.3])


def _reed(amps, decays, f0=440.0, onset=0.0, vel=1.0, seed=42, sr=SR):
    p = reed.make_params(f0, RATIOS, jnp.asarray(amps, dtype=jnp.float64),
                         jnp.asarray(decays, dtype=jnp.float64), onset, vel, sr)
    s = reed.init_state(p, seed)
    return p, s


def _render(p, s, n):
    _, out = reed.render(p, s, n)
    return np.asarray(out)


def _crossings(buf):
    return int(((buf[:-1] < 0) & (buf[1:] >= 0)).sum())


def test_single_mode_sine():
    amps = np.zeros(NUM_MODES); amps[0] = 1.0
    p, s = _reed(amps, np.zeros(NUM_MODES))
    buf = _render(p, s, int(SR))
    assert abs(_crossings(buf) - 440) < 3


def test_decay():
    amps = np.zeros(NUM_MODES); amps[0] = 1.0
    decays = np.zeros(NUM_MODES); decays[0] = 60.0
    p, s = _reed(amps, decays)
    buf = _render(p, s, int(SR * 0.5))
    peak = np.abs(buf[-200:]).max()
    assert 0.01 < peak < 0.1


def test_onset_ramp_shapes_attack():
    amps = np.zeros(NUM_MODES); amps[0] = 1.0
    p, s = _reed(amps, np.zeros(NUM_MODES), onset=0.020)
    buf = _render(p, s, int(SR * 0.05))
    assert abs(buf[0]) < 0.01
    mid = int(0.010 * SR)
    assert np.abs(buf[mid - 5:mid + 5]).max() < 0.8
    late = int(SR * 0.030)
    assert np.abs(buf[late:late + 200]).max() > 0.85


def test_onset_ramp_ff_vs_pp():
    amps = np.zeros(NUM_MODES); amps[0] = 1.0
    p_ff, s_ff = _reed(amps, np.zeros(NUM_MODES), onset=0.001, vel=1.0)
    p_pp, s_pp = _reed(amps, np.zeros(NUM_MODES), onset=0.005, vel=0.0)
    n = int(SR * 0.010)
    t2 = int(SR * 0.002)
    ff = _render(p_ff, s_ff, n)[:t2]
    pp = _render(p_pp, s_pp, n)[:t2]
    assert (ff**2).sum() > (pp**2).sum() * 1.5


def test_jitter_deterministic_same_seed():
    amps = np.zeros(NUM_MODES); amps[0] = 1.0
    p1, s1 = _reed(amps, np.zeros(NUM_MODES), seed=42)
    p2, s2 = _reed(amps, np.zeros(NUM_MODES), seed=42)
    n = int(SR * 0.2)
    np.testing.assert_array_equal(_render(p1, s1, n), _render(p2, s2, n))


def test_jitter_breaks_phase_coherence():
    amps = np.zeros(NUM_MODES); amps[0] = 1.0; amps[1] = 0.3
    pa, sa = _reed(amps, np.zeros(NUM_MODES), seed=100)
    pb, sb = _reed(amps, np.zeros(NUM_MODES), seed=200)
    n = int(SR * 0.5)
    a, b = _render(pa, sa, n), _render(pb, sb, n)
    late = int(SR * 0.2)
    rms_diff = np.sqrt(np.mean((a[late:] - b[late:]) ** 2))
    rms_sig = np.sqrt(np.mean(a[late:] ** 2))
    rel = rms_diff / max(rms_sig, 1e-10)
    assert 0.001 < rel < 0.5


def test_damper_progressive_silence():
    amps = np.zeros(NUM_MODES); amps[0] = 1.0
    p, s = _reed(amps, np.zeros(NUM_MODES))
    _, out1 = reed.render(p, s, 1000)
    s1, _ = reed.render(p, s, 1000)
    s_damped = reed.start_damper(s1, 60, SR)
    s2, out2 = reed.render(p, s_damped, int(SR * 0.5))
    # After 0.5 s of mid-register damping, envelope far below initial
    assert float(jnp.abs(out2[-100:]).max()) < 0.02
    assert bool(reed.is_silent(p, s2, -30.0))


def test_damper_top_keys_undamped():
    amps = np.zeros(NUM_MODES); amps[0] = 1.0
    p, s = _reed(amps, np.zeros(NUM_MODES))
    s_d = reed.start_damper(s, 95, SR)  # >= 92: no damper
    assert not bool(s_d.damper_active)


# ── Hammer ───────────────────────────────────────────────────────────────


def test_dwell_ff_brighter_than_pp():
    ff = np.asarray(hammer.dwell_attenuation(1.0, 262.0, RATIOS))
    pp = np.asarray(hammer.dwell_attenuation(0.1, 262.0, RATIOS))
    assert (ff[1:] >= pp[1:]).all()


def test_dwell_fundamental_unity():
    atten = np.asarray(hammer.dwell_attenuation(0.5, 440.0, RATIOS))
    assert abs(atten[0] - 1.0) < 1e-10


def test_onset_ramp_register_dependent():
    bass = float(hammer.onset_ramp_time(1.0, 65.0))
    mid = float(hammer.onset_ramp_time(1.0, 262.0))
    treble = float(hammer.onset_ramp_time(1.0, 1047.0))
    assert bass > mid > treble
    assert abs(bass - 1.0 / 65.0) < 0.001
    assert abs(treble - 0.002) < 0.0001
    assert abs(mid - 1.0 / 262.0) < 0.001


def test_onset_ramp_velocity_dependent():
    ff = float(hammer.onset_ramp_time(1.0, 262.0))
    pp = float(hammer.onset_ramp_time(0.0, 262.0))
    assert abs(ff - 1.0 / 262.0) < 0.001
    assert abs(pp - 2.0 / 262.0) < 0.001


def test_attack_noise_decays_and_finishes():
    params, state = hammer.make_noise(1.0, 440.0, SR, 0x12345678)

    def body(st, _):
        st, y = hammer.noise_step(params, st)
        return st, y

    state, out = jax.lax.scan(body, state, None, length=1000)
    buf = np.asarray(out)
    assert (buf[:100] ** 2).sum() > (buf[600:700] ** 2).sum() * 5.0
    assert int(state.remaining) == 0
    # Fade-in forces first sample to exactly zero
    assert buf[0] == 0.0


# ── Pickup ───────────────────────────────────────────────────────────────


def _pickup_run(signal, sr=SR, scale=pickup.DEFAULT_DISPLACEMENT_SCALE):
    params = pickup.make_params(sr, scale)
    state = pickup.init_state()

    def body(st, x):
        return pickup.step(params, st, x)

    _, out = jax.lax.scan(body, state, jnp.asarray(signal))
    return np.asarray(out)


def test_soft_saturate_identity_below_knee():
    edge = pickup.PICKUP_KNEE_Y - 0.001
    for y in [-edge, -0.1, 0.0, 0.1, edge]:
        assert abs(float(pickup.soft_saturate(y)) - y) < 1e-15


def test_soft_saturate_bounded():
    ys = np.asarray(pickup.soft_saturate(
        jnp.array([0.95, 0.96, 0.98, 1.0, 2.0, 100.0, -100.0])))
    assert (np.abs(ys) <= pickup.PICKUP_MAX_Y + 1e-15).all()
    assert (np.abs(ys) >= pickup.PICKUP_KNEE_Y).all()


def test_soft_saturate_monotone_odd():
    y = jnp.linspace(-1.5, 1.5, 601)
    out = np.asarray(pickup.soft_saturate(y))
    assert (np.diff(out) >= -1e-12).all()
    np.testing.assert_allclose(out, -out[::-1], atol=1e-12)


def test_pickup_dc_equilibrium():
    out = _pickup_run(np.zeros(int(SR * 0.05)))
    assert np.abs(out).max() < 1e-10


def test_pickup_frequency_response_matches_rc():
    fc = 1.0 / (2.0 * np.pi * pickup.TAU_RC)
    amplitude = 0.01
    n = int(SR * 0.1)
    t = np.arange(n) / SR
    for freq in [100.0, 500.0, 1000.0, 2312.0, 5000.0, 10000.0]:
        out = _pickup_run(amplitude * np.sin(2 * np.pi * freq * t))
        measured = np.abs(out[n // 2:]).max()
        y_amp = amplitude * pickup.DEFAULT_DISPLACEMENT_SCALE
        hpf_gain = freq / np.sqrt(freq**2 + fc**2)
        expected = y_amp * pickup.PICKUP_SENSITIVITY * hpf_gain
        err_db = abs(20 * np.log10(measured / expected))
        assert err_db < 2.0, f"{freq} Hz: {err_db:.2f} dB"


def test_pickup_nonlinearity_h2():
    freq = 2000.0
    n = int(SR * 0.2)
    t = np.arange(n) / SR
    out = _pickup_run(np.sin(2 * np.pi * freq * t))
    seg = out[n * 3 // 4:]

    def mag(sig, f):
        ph = 2 * np.pi * f * np.arange(len(sig)) / SR
        return 2 * np.hypot((sig * np.cos(ph)).mean(), (sig * np.sin(ph)).mean())

    h1, h2, h3 = mag(seg, freq), mag(seg, 2 * freq), mag(seg, 3 * freq)
    assert h2 > h3
    assert h2 / h1 > 0.05


def test_pickup_asymmetry():
    freq = 500.0
    n = int(SR * 0.2)
    t = np.arange(n) / SR
    out = _pickup_run(0.5 * np.sin(2 * np.pi * freq * t))
    pos, neg = out[n // 2:].max(), abs(out[n // 2:].min())
    assert pos > neg * 1.05


# ── Biquad ───────────────────────────────────────────────────────────────


def test_biquad_bandpass():
    n = int(SR * 0.1)
    t = np.arange(n) / SR
    coeffs = biquad.bandpass(1000.0, 1.0, SR)

    _, out_c = biquad.process(coeffs, biquad.init_state(),
                              jnp.asarray(np.sin(2 * np.pi * 1000.0 * t)))
    _, out_l = biquad.process(coeffs, biquad.init_state(),
                              jnp.asarray(np.sin(2 * np.pi * 100.0 * t)))
    pc = np.abs(np.asarray(out_c)[n // 2:]).max()
    pl = np.abs(np.asarray(out_l)[n // 2:]).max()
    assert pc > pl * 3.0


# ── Voice ────────────────────────────────────────────────────────────────


def test_render_note_produces_audio():
    out = np.asarray(voice.render_note(60, 0.8, 0.25, SR))
    assert np.abs(out).max() > 0.0
    assert np.isfinite(out).all()


def test_higher_velocity_is_louder():
    out = np.asarray(voice.render_note(
        jnp.array([60.0, 60.0]), jnp.array([0.3, 1.0]), 0.1, SR))
    soft, loud = np.abs(out[:, 0]).max(), np.abs(out[:, 1]).max()
    assert loud > soft


def test_voice_deterministic():
    a = np.asarray(voice.render_note(60, 0.8, 0.1, SR))
    b = np.asarray(voice.render_note(60, 0.8, 0.1, SR))
    np.testing.assert_array_equal(a, b)


def test_different_notes_differ():
    out = np.asarray(voice.render_note(
        jnp.array([60.0, 72.0]), jnp.array([0.8, 0.8]), 0.1, SR))
    assert np.abs(out[:, 0] - out[:, 1]).max() > 0


def test_batched_matches_single():
    # Batched grid render matches individual renders (up to XLA op-ordering
    # noise ~1e-16 — far below the −60 dB parity gate).
    grid = np.asarray(voice.render_note(
        jnp.array([48.0, 60.0, 72.0]), jnp.array([0.8, 0.8, 0.8]), 0.05, SR))
    single = np.asarray(voice.render_note(60, 0.8, 0.05, SR))
    np.testing.assert_allclose(grid[:, 1], single, rtol=0, atol=1e-12)


def test_voice_note_off_silences():
    vp, detuned = voice.note_on_params(60, 0.8, SR, mlp_enabled=False)
    st = voice.init_state(vp, detuned, 0.8, SR, voice.default_note_seed(60))
    st, _ = voice.render(vp, st, 2000)
    st = voice.note_off(vp, st, SR)
    st, out = voice.render(vp, st, int(SR * 0.5))
    tail = np.abs(np.asarray(out)[-1000:]).max()
    assert tail < 1e-4
