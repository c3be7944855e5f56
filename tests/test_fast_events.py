"""Event-capable fused voice bank: onset/release schedules, damper,
state-carried block streaming, and the host-side sustain scheduler.

Parity reference is the f64 scan path (voice.render + voice.note_off at
the release sample). Gate: the project-wide −60 dB peak deviation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from openwurli_tpu import fast, voice
from openwurli_tpu.io.midi_file import Event
from openwurli_tpu.kernels import voice_bank

SR = 44100.0


def _ref_voice(midi, vel, total, release=None):
    """f64 single-voice render with an optional note_off at `release`."""
    vp, det = voice.note_on_params(jnp.asarray([midi]), jnp.asarray([vel]),
                                   SR, mlp_enabled=False)
    st = voice.init_state(vp, det, jnp.asarray([vel]), SR,
                          voice.default_note_seed(jnp.asarray([midi])))
    if release is None or release >= total:
        st, out = voice.render(vp, st, total)
        return np.asarray(out[:, 0])
    st, head = voice.render(vp, st, release)
    st = voice.note_off(vp, st, SR)
    st, tail = voice.render(vp, st, total - release)
    return np.concatenate([np.asarray(head[:, 0]), np.asarray(tail[:, 0])])


def _err_db(ref, got):
    peak = np.abs(ref).max()
    return 20 * np.log10(max(np.abs(got - ref).max(), 1e-300) / peak)


@pytest.mark.slow
def test_event_kernel_matches_scan_within_60db():
    """Staggered onsets + releases (all three damper-ramp registers and
    an undamped top key) against the f64 path."""
    notes = [50.0, 69.0, 95.0, 60.0]
    vels = [0.9, 0.8, 0.85, 0.7]
    onsets = [0, 512, 1024, 2048]
    releases = [4000, 6000, 5000, np.inf]
    total = 12000

    params, n_active = voice_bank.make_kernel_params(
        notes, vels, SR, onsets=onsets, releases=releases)
    out_k = np.asarray(voice_bank.render_voice_bank(params, total,
                                                    True))[:, :n_active]
    for k in range(n_active):
        on, rel = onsets[k], releases[k]
        rel_local = None if not np.isfinite(rel) else int(rel) - on
        ref = _ref_voice(notes[k], vels[k], total - on, rel_local)
        got = out_k[:, k]
        assert np.abs(got[:on]).max() == 0.0 if on else True
        db = _err_db(ref, got[on:])
        assert db < -60.0, f"voice {k} (midi {notes[k]}): {db:.1f} dB"
        if rel_local is not None and notes[k] < 92.0:
            # the damper actually damps: post-release tail decays
            # (top-5 keys, midi ≥ 92, are undamped by design)
            pre = np.abs(ref[rel_local - 256:rel_local]).max()
            post = np.abs(ref[-256:]).max()
            assert post < 0.1 * pre, (pre, post)


def test_trivial_schedule_matches_plain_path():
    """onsets=0 / releases=inf through the event code path must match
    the no-event kernel. The gate is ulp-level, not array_equal: the
    events path wraps the identical state-update arithmetic in lane
    selects (active masks / damper phases), which changes the
    compiler's FMA-contraction choices — measured ≤6e-7 relative on a
    handful of samples, ~120 dB below the −60 dB parity gates."""
    notes = [60.0, 72.0]
    vels = [0.8, 0.9]
    total = 2048
    params, _ = voice_bank.make_kernel_params(notes, vels, SR)
    a = np.asarray(voice_bank.render_voice_bank(params, total, True,
                                                events=False))
    b = np.asarray(voice_bank.render_voice_bank(params, total, True,
                                                events=True))
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, rtol=0, atol=2e-6 * scale)


def test_state_carry_blocks_are_bit_exact():
    """Two carried-state blocks == one continuous render."""
    notes = [55.0, 70.0]
    vels = [0.85, 0.75]
    total = 4096
    params, _ = voice_bank.make_kernel_params(
        notes, vels, SR, onsets=[0, 1024], releases=[3000, np.inf])
    whole = np.asarray(voice_bank.render_voice_bank(params, total, True))
    half = total // 2
    a, st = voice_bank.render_voice_bank(params, half, True,
                                         return_state=True)
    b = voice_bank.render_voice_bank(params, half, True, state=st,
                                     n0=half)
    stitched = np.concatenate([np.asarray(a), np.asarray(b)])
    assert np.array_equal(whole, stitched), np.abs(whole - stitched).max()


def test_schedule_events_sustain_semantics():
    """note-off under a held pedal defers the damper to pedal release;
    re-striking a ringing note damps the old instance."""
    ev = [
        Event(0.00, "on", 60, 100),
        Event(0.05, "sustain", 0, 127),   # pedal down
        Event(0.10, "off", 60, 0),        # held by pedal
        Event(0.15, "on", 64, 90),
        Event(0.20, "on", 60, 80),        # re-strike: damps instance 0
        Event(0.25, "off", 64, 0),        # held by pedal
        Event(0.30, "sustain", 0, 0),     # pedal up: releases pending 64
        Event(0.50, "off", 60, 0),        # releases instance 2
    ]
    midis, vels, onsets, releases = fast.schedule_events(ev, 1000.0)
    assert midis.tolist() == [60.0, 64.0, 60.0]
    assert onsets.tolist() == [0.0, 150.0, 200.0]
    # instance 0: note-off at 0.10 deferred by the pedal, then damped
    # early by the re-strike at 0.20
    assert releases[0] == 200.0
    # instance 1 (64): note-off at 0.25 held, released at pedal-up 0.30
    assert releases[1] == 300.0
    # instance 2: plain note-off at 0.50 (pedal already up)
    assert releases[2] == 500.0


@pytest.mark.slow
def test_render_events_end_to_end():
    """Block-streamed full-chain event render produces finite audio that
    starts at the first onset and decays after the last release."""
    midis = np.array([60.0, 64.0, 67.0])
    vels = np.array([0.9, 0.85, 0.8])
    onsets = np.array([0.0, 2048.0, 4096.0])
    releases = np.array([20000.0, 22000.0, 24000.0])
    out = fast.render_events(midis, vels, onsets, releases,
                             seconds=44032 / SR, warm_seconds=0.0,
                             block_seconds=0.25, interpret=True,
                             t_tile=256)
    assert out.shape[0] == 44032
    assert np.isfinite(out).all()
    body = np.abs(out[6000:20000]).max()
    tail = np.abs(out[-2000:]).max()
    assert body > 1e-4
    assert tail < 0.2 * body


def test_block_stream_exact_for_non_tile_multiple_blocks():
    """Regression: the carried state must correspond to num_samples even
    when the block length is NOT a multiple of the kernel's internal
    time tile (the kernel used to round the render up to whole tiles,
    desyncing every later block)."""
    midis = np.array([60.0, 72.0])
    params, _ = voice_bank.make_kernel_params(
        midis, np.array([0.8, 0.7]), SR,
        onsets=np.zeros(2), releases=np.array([800.0, voice_bank.NEVER]))
    pn = np.asarray(params)
    mr = voice_bank._min_release(pn)
    whole = np.asarray(voice_bank.render_voice_bank(
        params, 1200, True, events=True, min_release=mr))
    state = voice_bank.init_bank_state(pn)
    blocks = []
    for b in range(3):
        o, state = voice_bank.render_voice_bank(
            params, 400, True, events=True, min_release=mr,
            state=state, n0=b * 400, return_state=True)
        blocks.append(np.asarray(o))
    np.testing.assert_array_equal(whole, np.concatenate(blocks, axis=0))


def test_scatter_voices_long_song_in_bounds():
    """Regression (advisor, round 3): dynamic_slice starts clamped
    whenever onset < t_total − t_voice, so every early note of a song
    longer than the voice window contributed pure silence. Pure-NumPy
    shift-and-sum oracle across onsets on both sides of the old clamp
    boundary."""
    rng = np.random.default_rng(0)
    t_total, t_voice, n = 4096, 512, 5
    voices = rng.standard_normal((t_voice, n)).astype(np.float32)
    onsets = np.array([0, 16, 1024, 3000, 3904], dtype=np.int32)
    lens = np.array([512, 400, 512, 512, 512], dtype=np.int32)
    got = np.asarray(fast._scatter_voices(
        jnp.asarray(voices), jnp.asarray(onsets), jnp.asarray(lens),
        t_total, t_voice))[:, 0]
    want = np.zeros(t_total, dtype=np.float64)
    for i in range(n):
        ln = min(int(lens[i]), t_voice, t_total - int(onsets[i]))
        want[onsets[i]:onsets[i] + ln] += voices[:ln, i].astype(np.float64)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-4)
    # the early (onset < t_total - t_voice) notes actually sound
    assert np.abs(got[:512]).max() > 0.1


def test_voice_lifetimes_reference_semantics():
    """Retirement is release-relative (voice.rs:183-185), not
    onset-relative: released voices render their damper tail, never-
    released voices ring to the natural −80 dB decay point, top-5 keys
    ignore the damper entirely."""
    sr = 44100.0
    t_total = int(60 * sr)
    NEVER = voice_bank.NEVER
    midis = np.array([60.0, 60.0, 36.0, 95.0, 95.0])
    onsets = np.zeros(5)
    releases = np.array([11.0 * sr, NEVER, NEVER, 11.0 * sr, NEVER])
    lens = fast._voice_lifetimes(midis, onsets, releases, sr, t_total)
    # released at 11 s: lives PAST the old 10 s onset-relative cut, and
    # past its release (the damper tail renders), but not much past
    assert 11.0 * sr < lens[0] < 12.5 * sr
    # never released, middle C: natural decay 0.005·f^1.22 ≈ 4.4 dB/s →
    # −80 dB around 18 s; no 10 s retirement
    assert 10.0 * sr < lens[1] < 20.0 * sr
    # never released, low note: 3 dB/s floor → ~26.8 s
    assert 25.0 * sr < lens[2] < 28.0 * sr
    # undamped top key (midi ≥ 92): a release changes nothing
    assert lens[3] == lens[4]
    assert (lens <= t_total).all()


def test_song_voices_long_song_matches_shifted_single_renders():
    """Voice + scatter stage of the time-parallel renderer at a song
    length ≫ the voice window (the shape the round-3 advisor showed
    silenced early notes). Oracle: the same kernel render shifted and
    truncated in NumPy."""
    sr = 8000.0
    t_total = int(13.0 * sr)
    midis = np.array([60.0, 64.0])
    vels = np.array([0.9, 0.7])
    onsets = np.array([0.0, np.round(11.5 * sr / 16) * 16])
    releases = np.array([0.5 * sr, 12.0 * sr])
    rel_local = releases - onsets
    lens = fast._voice_lifetimes(midis, onsets, releases, sr, t_total)
    t_tile = 32
    audio = np.asarray(fast._song_voices(
        midis, vels, onsets, rel_local, lens, t_total, sr,
        interpret=True, t_tile=t_tile))[:, 0]
    t_voice = -(-int(lens.max()) // t_tile) * t_tile
    params, _ = voice_bank.make_kernel_params(
        midis, vels, sr, onsets=np.zeros(2), releases=rel_local)
    v = np.asarray(voice_bank.render_voice_bank(params, t_voice, True,
                                                events=True))[:, :2]
    want = np.zeros(t_total, dtype=np.float64)
    for i in range(2):
        o = int(onsets[i])
        ln = min(int(lens[i]), t_total - o)
        want[o:o + ln] += v[:ln, i].astype(np.float64)
    np.testing.assert_allclose(audio, want.astype(np.float32), atol=2e-6)
    # the early note sounds (the old bug rendered it as silence)
    assert np.abs(audio[:int(0.5 * sr)]).max() > 1e-4


@pytest.mark.slow
def test_render_events_parallel_production_tiles():
    """Time-parallel vs serial at PRODUCTION tile geometry (the round-3
    gate only covered t_tile=32 toy tiles): T_TILE=512 chain tiles,
    8 segments, a pedal-style overlap, 4 s at 8 kHz. Measured −37.6 dB
    RMS — at the chain's own −39 dB trajectory-sensitivity bound
    (tests/test_mono_chain.py); gate at −35 with margin. Regression
    anchor: the round-4 warm-rounding bug (parallel rounded the warm
    pre-roll DOWN to the tile grid, serial UP — misaligned tremolo
    trajectories) read −14.6 dB here while the t_tile=32 gate passed."""
    from openwurli_tpu.kernels import mono_chain as mc

    sr = 8000.0
    midis = np.array([60.0, 48.0, 67.0, 64.0])
    vels = np.array([0.8, 0.9, 0.6, 0.7])
    onsets = np.array([0.0, np.round(0.5 * sr / 16) * 16,
                       np.round(1.4 * sr / 16) * 16,
                       np.round(2.2 * sr / 16) * 16])
    releases = np.array([1.0 * sr, 2.6 * sr, np.inf, 3.4 * sr])
    par = fast.render_events_parallel(
        midis, vels, onsets, releases, 4.0, sr, segments=8,
        warm_seconds=1.0, interpret=True, t_tile=mc.T_TILE)
    ser = fast.render_events(
        midis, vels, onsets, releases, 4.0, sr, warm_seconds=1.0,
        interpret=True, t_tile=mc.T_TILE, block_seconds=1.0)
    assert par.shape == ser.shape
    assert np.isfinite(par).all()
    rms_ref = np.sqrt(np.mean(ser**2))
    rms_err = np.sqrt(np.mean((par - ser)**2))
    db = 20 * np.log10(max(rms_err, 1e-30) / max(rms_ref, 1e-30))
    assert db < -35.0, f"production-tile time-parallel parity {db:.1f} dB"


@pytest.mark.slow
def test_render_events_parallel_matches_serial():
    """Time-parallel (segmented) song render vs the serial block-streamed
    path. Gate at the chain's own trajectory-sensitivity bound (see
    tests/test_mono_chain.py full-chain notes): segment warm-up
    reproduces every fading-memory component and the injected tremolo
    phase is exact, so the residual is the chain's low-order-bit
    amplification."""
    sr = 8000.0
    midis = np.array([60.0, 64.0, 55.0])
    vels = np.array([0.8, 0.6, 0.9])
    onsets = np.array([0.0, np.round(0.3 * sr / 16) * 16,
                       np.round(0.9 * sr / 16) * 16])
    releases = np.array([1.2 * sr, 1.5 * sr, np.inf])
    warm = 8000
    par = fast.render_events_parallel(
        midis, vels, onsets, releases, 2.0, sr, segments=4,
        warm_seconds=warm / sr, interpret=True, t_tile=32)
    ser = fast.render_events(
        midis, vels, onsets, releases, 2.0, sr, warm_seconds=warm / sr,
        interpret=True, t_tile=32, block_seconds=0.5)
    assert par.shape == ser.shape
    assert np.isfinite(par).all()
    rms_ref = np.sqrt(np.mean(ser**2))
    rms_err = np.sqrt(np.mean((par - ser)**2))
    db = 20 * np.log10(max(rms_err, 1e-30) / max(rms_ref, 1e-30))
    assert db < -35.0, f"time-parallel parity {db:.1f} dB"
