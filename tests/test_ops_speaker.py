"""Oversampler and speaker cabinet tests (ports of reference invariants)."""

import jax
import jax.numpy as jnp
import numpy as np

from openwurli_tpu.circuits import speaker
from openwurli_tpu.ops import allpass

SR = 44100.0


def test_oversampler_roundtrip_preserves_signal():
    n = 1024
    t = np.arange(n) / SR
    x = jnp.asarray(np.sin(2 * np.pi * 440.0 * t))
    st = allpass.init_state()
    st, up = allpass.upsample_2x(st, x)
    assert up.shape == (2 * n,)
    st, down = allpass.downsample_2x(st, up)
    ratio = float(jnp.abs(down[n // 2:]).max()) / float(jnp.abs(x[n // 2:]).max())
    assert abs(ratio - 1.0) < 0.1


def test_oversampler_stopband_rejection():
    n = 4096
    sr2 = 88200.0
    t = np.arange(2 * n) / sr2
    up = jnp.asarray(np.sin(2 * np.pi * 30000.0 * t))
    st = allpass.init_state()
    _, down = allpass.downsample_2x(st, up)
    atten_db = 20 * np.log10(
        float(jnp.abs(down[n // 2:]).max()) / float(jnp.abs(up[n:]).max()))
    assert atten_db < -20.0, f"{atten_db:.1f} dB"


def test_oversampler_passband_flat():
    n = 4096
    t = np.arange(n) / SR
    x = jnp.asarray(np.sin(2 * np.pi * 1000.0 * t))
    st = allpass.init_state()
    st, up = allpass.upsample_2x(st, x)
    st, down = allpass.downsample_2x(st, up)
    start = n * 3 // 4
    err_db = abs(20 * np.log10(
        float(jnp.abs(down[start:]).max()) / float(jnp.abs(x[start:]).max())))
    assert err_db < 0.5


def test_oversampler_batched():
    n = 256
    t = np.arange(n) / SR
    x = np.stack([np.sin(2 * np.pi * 440.0 * t),
                  np.sin(2 * np.pi * 880.0 * t)], axis=1)
    st = allpass.init_state((2,))
    st, up = allpass.upsample_2x(st, jnp.asarray(x))
    assert up.shape == (2 * n, 2)
    _, down = allpass.downsample_2x(st, up)
    assert down.shape == (n, 2)
    assert np.isfinite(np.asarray(down)).all()


# ── Speaker ──────────────────────────────────────────────────────────────


def _speaker_response(character, freq, sr=SR, dur=0.2, amp=1.0):
    params = speaker.make_params(sr)
    coeffs = speaker.coeffs_for_character(character, sr)
    state = speaker.init_state()
    n = int(sr * dur)
    t = np.arange(n) / sr
    xs = jnp.asarray(amp * np.sin(2 * np.pi * freq * t))

    def body(st, x):
        return speaker.step(params, st, coeffs, x)

    _, out = jax.lax.scan(body, state, xs)
    return float(jnp.abs(out[n // 2:]).max())


def test_speaker_authentic_bass_preserved_subsonic_removed():
    mid = _speaker_response(1.0, 500.0)
    bass = _speaker_response(1.0, 55.0)
    subsonic = _speaker_response(1.0, 12.0)
    assert 20 * np.log10(bass / mid) > -3.0
    assert 20 * np.log10(subsonic / mid) < -6.0


def test_speaker_authentic_treble_rolloff():
    mid = _speaker_response(1.0, 1000.0)
    treble = _speaker_response(1.0, 15000.0)
    assert 20 * np.log10(treble / mid) < -6.0


def test_speaker_bypass_is_flat():
    low = _speaker_response(0.0, 100.0)
    mid = _speaker_response(0.0, 1000.0)
    high = _speaker_response(0.0, 10000.0)
    assert abs(20 * np.log10(low / mid)) < 1.0
    assert abs(20 * np.log10(high / mid)) < 1.0


def _speaker_thd(freq, amp, sr=SR):
    params = speaker.make_params(sr)
    coeffs = speaker.coeffs_for_character(1.0, sr)
    state = speaker.init_state()
    n = int(sr * 0.5)
    t = np.arange(n) / sr
    xs = jnp.asarray(amp * np.sin(2 * np.pi * freq * t))

    def body(st, x):
        return speaker.step(params, st, coeffs, x)

    _, out = jax.lax.scan(body, state, xs)
    seg = np.asarray(out)[n // 2:]
    ph = 2 * np.pi * freq * np.arange(len(seg)) / sr

    def mag(k):
        return np.hypot((seg * np.cos(k * ph)).mean(),
                        (seg * np.sin(k * ph)).mean())

    f, h2, h3 = mag(1), mag(2), mag(3)
    return np.hypot(h2, h3) / f, h2, h3


def test_speaker_nonlinearity_generates_harmonics():
    thd, h2, h3 = _speaker_thd(200.0, 0.8)
    assert thd > 0.005
    assert h2 > 0.0001
    assert h3 > 0.0001


def test_speaker_nonlinearity_amplitude_dependent():
    thd_loud, _, _ = _speaker_thd(200.0, 0.8)
    thd_quiet, _, _ = _speaker_thd(200.0, 0.2)
    assert thd_loud > thd_quiet * 1.2


def test_speaker_thermal_compression():
    params = speaker.make_params(SR)
    coeffs = speaker.coeffs_for_character(1.0, SR)
    state = speaker.init_state()
    n = int(SR * 8.0)
    t = np.arange(n) / SR
    xs = jnp.asarray(0.9 * np.sin(2 * np.pi * 300.0 * t))

    def body(st, x):
        return speaker.step(params, st, coeffs, x)

    _, out = jax.lax.scan(body, state, xs)
    out = np.asarray(out)
    settle, early_end = int(SR * 0.2), int(SR * 0.5)
    early = np.abs(out[settle:early_end]).max()
    late = np.abs(out[-int(SR * 0.5):]).max()
    assert 20 * np.log10(late / early) < -0.3
