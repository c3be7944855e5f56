"""Engine behavioral tests — ports of the reference engine.rs suite.

Voice lifecycle, stealing priority, sustain-pedal semantics, NaN guards,
volume decoupling, peak invariant, tremolo swing. Render durations are
trimmed where the assertion allows (1-core CPU CI).
"""

import functools

import numpy as np
import pytest

from openwurli_tpu import engine
from openwurli_tpu.engine import FREE, HELD, MAX_VOICES, RELEASING, SUSTAINED

pytestmark = pytest.mark.slow  # multi-minute end-to-end renders on 1-core CPU

SR = 44100.0


@functools.lru_cache(maxsize=1)
def _warm_engine_params():
    # Build params once; Engine() construction after this is cheap.
    e = engine.Engine(SR)
    return e.params


@pytest.fixture
def eng():
    _warm_engine_params()
    return engine.Engine(SR)


def test_note_on_allocates_voice(eng):
    eng.note_on(60, 0.8)
    assert eng.held_voice_count() == 1


def test_note_off_releases_voice(eng):
    eng.note_on(60, 0.8)
    eng.note_off(60)
    assert eng.held_voice_count() == 0
    assert eng.count_voices_in_state(RELEASING) == 1


def test_polyphony_up_to_max_voices(eng):
    for n in range(MAX_VOICES):
        eng.note_on(36 + n, 0.8)
    assert eng.held_voice_count() == MAX_VOICES


def test_voice_stealing_when_full(eng):
    for n in range(MAX_VOICES):
        eng.note_on(36 + n, 0.8)
    eng.note_on(96, 0.8)
    assert eng.held_voice_count() == MAX_VOICES
    assert eng.has_steal_voice_for(96)


def test_render_produces_output(eng):
    eng.note_on(60, 0.8)
    out = np.asarray(eng.render(256))
    assert (out.astype(np.float64) ** 2).sum() > 0.0


def test_render_no_notes_is_near_silent(eng):
    out = np.asarray(eng.render(512))
    assert np.abs(out).max() < 0.05


def test_sustain_defers_note_off(eng):
    eng.set_sustain(True)
    eng.note_on(60, 0.8)
    eng.note_off(60)
    assert eng.sustained_voice_count() == 1
    assert eng.held_voice_count() == 0
    eng.set_sustain(False)
    assert eng.sustained_voice_count() == 0


def test_note_clamps_to_valid_range(eng):
    eng.note_on(0, 0.8)
    eng.note_on(127, 0.8)
    assert eng.held_voice_count() == 2


def test_sustain_pedal_release_triggers_damping(eng):
    eng.set_sustain(True)
    eng.note_on(60, 0.8)
    eng.note_off(60)
    assert eng.sustained_voice_count() == 1
    eng.set_sustain(False)
    assert eng.sustained_voice_count() == 0
    assert eng.count_voices_in_state(RELEASING) == 1


def test_sustain_held_voices_still_render(eng):
    eng.set_sustain(True)
    eng.note_on(60, 0.8)
    eng.render(512)
    eng.note_off(60)
    eng.render(512)
    eng.set_sustain(False)
    out = np.asarray(eng.render(512))
    assert (out.astype(np.float64) ** 2).sum() > 0.0


def test_voice_stealing_prefers_sustained_over_held(eng):
    eng.set_sustain(True)
    for n in range(MAX_VOICES // 2):
        eng.note_on(36 + n, 0.8)
        eng.note_off(36 + n)
    for n in range(MAX_VOICES // 2, MAX_VOICES):
        eng.note_on(36 + n, 0.8)
    sustained_before = eng.sustained_voice_count()
    held_before = eng.held_voice_count()
    assert sustained_before + held_before == MAX_VOICES

    eng.note_on(127, 0.8)
    assert eng.held_voice_count() == held_before + 1
    assert eng.sustained_voice_count() == sustained_before - 1


def test_reattack_releases_sustained_same_note(eng):
    eng.set_sustain(True)
    eng.note_on(60, 0.8)
    eng.note_off(60)
    eng.note_on(60, 0.8)
    assert eng.count_voices_with_note_in_state(60, SUSTAINED) == 0
    assert eng.count_voices_with_note_in_state(60, HELD) == 1


def test_pedal_up_only_releases_sustained_not_held(eng):
    eng.set_sustain(True)
    eng.note_on(60, 0.8)
    eng.note_off(60)
    eng.note_on(64, 0.8)
    assert eng.sustained_voice_count() == 1
    assert eng.held_voice_count() == 1
    eng.set_sustain(False)
    assert eng.sustained_voice_count() == 0
    assert eng.held_voice_count() == 1


def test_note_off_for_nonexistent_note_is_noop(eng):
    eng.note_on(60, 0.8)
    eng.note_off(72)
    assert eng.held_voice_count() == 1


def test_higher_velocity_louder(eng):
    eng.set_volume(0.5)
    eng.note_on(60, 0.2)
    soft = np.asarray(eng.render(4096), dtype=np.float64)
    eng2 = engine.Engine(SR)
    eng2.set_volume(0.5)
    eng2.note_on(60, 1.0)
    loud = np.asarray(eng2.render(4096), dtype=np.float64)
    assert np.sqrt((loud**2).mean()) > np.sqrt((soft**2).mean())


def test_volume_zero_and_back_no_nan(eng):
    eng.note_on(60, 0.8)
    for _ in range(2):
        eng.set_volume(0.0)
        out1 = np.asarray(eng.render(512))
        eng.set_volume(0.5)
        out2 = np.asarray(eng.render(512))
    assert np.isfinite(out1).all() and np.isfinite(out2).all()
    assert eng.nan_guard_fires() == 0


def test_user_volume_scales_output_linearly():
    # DECOUPLING INVARIANT: volume is a linear post-amp multiplier; the BJT
    # operating point must be identical at any volume (FIXED_CIRCUIT_DRIVE).
    def render_at(vol):
        e = engine.Engine(SR)
        e.set_volume(vol)
        e.set_tremolo_depth(0.0)
        e.set_speaker_character(0.0)
        e.set_mlp_enabled(True)
        e.render(1536)  # settle the volume smoother
        e.note_on(60, 0.95)
        out = np.asarray(e.render(int(SR * 0.25)), dtype=np.float64)
        return np.abs(out).max()

    _warm_engine_params()
    p05 = render_at(0.5)
    p10 = render_at(1.0)
    ratio = p10 / p05
    assert 1.96 <= ratio <= 2.04, (p05, p10, ratio)


def test_engine_peak_below_unity_at_vol_1():
    # PSG sizing invariant: worst documented chord-ff at vol=1.0, tremolo
    # bright, MLP on → engine peak ≤ 1.0 (+0.02 slack).
    _warm_engine_params()
    e = engine.Engine(SR)
    e.set_volume(1.0)
    e.set_tremolo_depth(1.0)
    e.set_speaker_character(0.0)
    e.set_mlp_enabled(True)
    e.render(1536)
    for n in [48, 55, 60, 63, 67, 70]:
        e.note_on(n, 0.95)
    out = np.asarray(e.render(int(SR * 1.0)))
    peak = np.abs(out).max()
    assert peak <= 1.02, f"engine peak {peak:.4f} exceeds 1.0 + slack"
    # And the chord should actually be loud — catches level-staging bugs.
    assert peak > 0.15, f"engine peak {peak:.4f} suspiciously quiet"


def test_tremolo_produces_rms_swing():
    _warm_engine_params()
    e = engine.Engine(SR)
    e.note_on(60, 0.9)
    total = int(SR * 2.0)
    samples = np.asarray(e.render(total), dtype=np.float64)
    win = int(SR) // 50
    skip = 25
    env_db = []
    for i in range(skip, len(samples) // win):
        seg = samples[i * win:(i + 1) * win]
        env_db.append(20 * np.log10(np.sqrt((seg**2).mean()) + 1e-12))
    swing = max(env_db) - min(env_db)
    assert swing > 3.0, f"tremolo swing {swing:.2f} dB at default depth 0.5"
