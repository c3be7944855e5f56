"""Plugin host-shell tests — sample-accurate event splitting, params."""

import numpy as np
import pytest

from openwurli_tpu.host import MidiEvent, WurliParams, WurliPlugin

pytestmark = pytest.mark.slow  # multi-minute end-to-end renders on 1-core CPU


def test_process_block_with_events():
    plug = WurliPlugin(44100.0)
    out = plug.process(512, [
        MidiEvent(100, "note_on", note=60, velocity=0.8),
        MidiEvent(300, "note_on", note=67, velocity=0.7),
    ])
    assert out.shape == (512, 2)
    # stereo fan-out: both channels identical
    np.testing.assert_array_equal(out[:, 0], out[:, 1])
    # note starts exactly at its sample offset: silence up to ~100
    assert np.abs(out[:100, 0]).max() < 0.05
    assert (out[100:, 0] ** 2).sum() > 0
    assert plug.engine.held_voice_count() == 2


def test_note_on_zero_velocity_is_note_off():
    plug = WurliPlugin(44100.0)
    plug.process(64, [MidiEvent(0, "note_on", note=60, velocity=0.8)])
    assert plug.engine.held_voice_count() == 1
    plug.process(64, [MidiEvent(0, "note_on", note=60, velocity=0.0)])
    assert plug.engine.held_voice_count() == 0


def test_cc64_sustain():
    plug = WurliPlugin(44100.0)
    plug.process(64, [
        MidiEvent(0, "cc", cc=64, value=127),
        MidiEvent(10, "note_on", note=60, velocity=0.8),
        MidiEvent(40, "note_off", note=60),
    ])
    assert plug.engine.sustained_voice_count() == 1
    plug.process(64, [MidiEvent(0, "cc", cc=64, value=0)])
    assert plug.engine.sustained_voice_count() == 0


def test_param_surface_defaults():
    p = WurliParams()
    assert p.volume == 0.5
    assert p.tremolo_depth == 0.5
    assert p.speaker_character == 0.0
    assert p.mlp_corrections is True
    assert p.authentic_noise is False
    assert p.noise_level == 1.0


def test_param_sync_applies():
    plug = WurliPlugin(44100.0)
    plug.params.volume = 0.9
    plug.params.tremolo_depth = 0.1
    plug.process(32)
    assert abs(float(plug.engine.state.volume.target) - 0.9) < 1e-9
    assert abs(float(plug.engine.state.trem_depth.target) - 0.1) < 1e-9
