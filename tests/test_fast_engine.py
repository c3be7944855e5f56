"""FastEngine — the interactive fused-kernel engine.

The load-bearing gate: a live note_on/note_off/set_sustain session must
produce BIT-IDENTICAL audio to fast.render_events given the same
schedule (FastEngine is the online form of the same kernels — lane
re-init at note-on equals scheduling from t=0 because the kernel
freezes pre-onset lanes)."""

import numpy as np
import pytest

from openwurli_tpu import fast
from openwurli_tpu.fast_engine import FastEngine

SR = 8000.0


def _mk(interpret=True, **kw):
    return FastEngine(SR, interpret=interpret, t_tile=32, **kw)


def test_session_matches_render_events_bit_exact():
    """Three notes started/stopped across blocks + a pedal hold, driven
    live, against the batch renderer with the equivalent schedule."""
    eng = _mk()
    eng.warm_up()
    blk = eng.block

    out = []
    eng.note_on(60, 0.9)
    out.append(eng.render(blk))           # block 0
    eng.note_on(64, 0.7)
    eng.set_sustain(True)
    out.append(eng.render(blk))           # block 1
    eng.note_off(60)                      # held by the pedal
    out.append(eng.render(blk))           # block 2
    eng.set_sustain(False)                # releases 60 at block 3 start
    eng.note_on(55, 0.8)
    out.append(eng.render(2 * blk))       # blocks 3-4
    eng.note_off(64)
    eng.note_off(55)
    out.append(eng.render(blk))           # block 5
    got = np.concatenate(out)

    midis = np.array([60.0, 64.0, 55.0])
    vels = np.array([0.9, 0.7, 0.8])
    onsets = np.array([0.0, 1.0 * blk, 3.0 * blk])
    releases = np.array([3.0 * blk, 5.0 * blk, 5.0 * blk])
    want = fast.render_events(midis, vels, onsets, releases,
                              seconds=6 * blk / SR, sample_rate=SR,
                              warm_seconds=0.6, block_seconds=blk / SR,
                              interpret=True, t_tile=32)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_midblock_event_offsets_bit_exact():
    """Events placed INSIDE a block via the offset argument match the
    batch renderer given the same absolute sample positions — the
    ≤16-sample placement story (the old path quantized everything to
    the ~23 ms block grid; the kernel always supported arbitrary
    onset/release samples, the quantization was host policy)."""
    eng = _mk()
    eng.warm_up()
    blk = eng.block

    out = []
    eng.note_on(60, 0.9, offset=48)          # mid-block onset
    out.append(eng.render(blk))              # block 0
    eng.note_on(64, 0.7, offset=blk - 16)    # near block end
    out.append(eng.render(blk))              # block 1
    eng.note_off(60, offset=100)             # mid-block release
    eng.set_sustain(True)
    out.append(eng.render(blk))              # block 2
    eng.note_off(64)                         # pedal-held
    eng.set_sustain(False, offset=32)        # pedal lift mid-block 3
    out.append(eng.render(2 * blk))          # blocks 3-4
    got = np.concatenate(out)

    midis = np.array([60.0, 64.0])
    vels = np.array([0.9, 0.7])
    onsets = np.array([48.0, 1.0 * blk + (blk - 16)])
    releases = np.array([2.0 * blk + 100, 3.0 * blk + 32])
    want = fast.render_events(midis, vels, onsets, releases,
                              seconds=5 * blk / SR, sample_rate=SR,
                              warm_seconds=0.6, block_seconds=blk / SR,
                              interpret=True, t_tile=32)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_lookahead_pipelining_bit_exact():
    """lookahead=k dispatches k extra blocks before blocking on a
    transfer (overlaps device compute with tunnel RTT). With the same
    schedule — events issued before the blocks they land in are
    DISPATCHED — the audio must be bit-identical to lookahead=0; and an
    event issued after its block went in-flight lands k blocks later
    (the documented latency cost), never corrupting dispatched audio."""
    a = _mk(lookahead=0)
    b = _mk(lookahead=2)
    for e in (a, b):
        e.warm_up()
        e.note_on(60, 0.9, offset=48)
    got_a = a.render(3 * a.block)
    got_b = b.render(3 * b.block)
    np.testing.assert_array_equal(got_a, got_b)

    # late event: with lookahead=2, blocks 3-4 are already in flight
    # when the note_off arrives, so it lands at block 5 (horizon), two
    # blocks later than the lookahead=0 engine places it.
    a.note_off(60, offset=16)
    b.note_off(60, offset=16)
    assert b._releases[0] == a._releases[0] + 2 * b.block
    tail_a = a.render(4 * a.block)
    tail_b = b.render(4 * b.block)
    assert np.isfinite(tail_a).all() and np.isfinite(tail_b).all()
    # both engines stay consistent with the batch renderer at their own
    # release positions
    for eng, tail in ((a, tail_a), (b, tail_b)):
        want = fast.render_events(
            np.array([60.0]), np.array([0.9]), np.array([48.0]),
            np.array([eng._releases[0]]), seconds=7 * eng.block / SR,
            sample_rate=SR, warm_seconds=0.6,
            block_seconds=eng.block / SR, interpret=True, t_tile=32)
        np.testing.assert_array_equal(tail, want[3 * eng.block:])


def test_event_offset_clipping():
    """Offsets clamp to the next un-rendered block: negative → 0,
    past-block → block-1 (the host must re-send farther-future events)."""
    eng = _mk()
    eng.note_on(60, 0.9, offset=-100)
    assert eng._onsets[0] == 0.0
    eng.note_on(64, 0.9, offset=10 * eng.block)
    assert eng._onsets[1] == eng.block - 1
    out = eng.render(eng.block)
    assert np.isfinite(out).all()


def test_restrike_damps_old_instance():
    """Re-striking a ringing note damps the old lane (engine.rs
    note_on re-strike semantics) — the restruck render must not blow up
    and the old instance's release is recorded."""
    eng = _mk()
    eng.note_on(60, 0.9)
    eng.render(eng.block)
    eng.note_on(60, 0.5)
    assert np.isfinite(eng._releases[0])
    out = eng.render(eng.block)
    assert np.isfinite(out).all()
    assert eng.active_voice_count() >= 1


def test_arbitrary_render_granularity():
    """render(n) for n not a block multiple buffers a surplus and
    stitches exactly."""
    a = _mk()
    b = _mk()
    for e in (a, b):
        e.note_on(69, 0.8)
    whole = a.render(2 * a.block)
    pieces = np.concatenate([b.render(100), b.render(b.block - 50),
                             b.render(b.block - 50)])
    np.testing.assert_array_equal(whole, pieces)


def test_silence_before_any_note():
    eng = _mk()
    eng.warm_up()   # cold chains carry the tremolo-pump settling transient
    out = eng.render(eng.block)
    assert out.shape == (eng.block,)
    # chain noise floor only (no voices yet)
    assert np.abs(out).max() < 1e-3


def test_lane_reuse_past_capacity():
    """More note instances than lanes: the oldest-retired lane is
    reused and rendering stays finite."""
    from openwurli_tpu import fast_engine as fe

    eng = _mk()
    # burn through > LANES instances with immediate note-offs
    for k in range(fe.LANES + 4):
        note = 40 + (k % 40)
        eng.note_on(note, 0.6)
        eng.note_off(note)
    assert eng._n_used == fe.LANES
    out = eng.render(eng.block)
    assert np.isfinite(out).all()


def test_fast_plugin_adapter_block_semantics():
    """FastWurliPlugin: WurliPlugin's process() contract (stereo fan-out,
    event dispatch, param sync) over the fused-kernel engine."""
    from openwurli_tpu.host import FastWurliPlugin, MidiEvent

    plug = FastWurliPlugin(SR, interpret=True, t_tile=32)
    plug.params.volume = 0.6
    blk = plug.engine.block
    out0 = plug.process(blk, [MidiEvent(0, "note_on", 60, 0.9)])
    out1 = plug.process(blk, [MidiEvent(10, "cc", cc=64, value=127),
                              MidiEvent(20, "note_off", 60)])
    for out in (out0, out1):
        assert out.shape == (blk, 2)
        assert np.isfinite(out).all()
        np.testing.assert_array_equal(out[:, 0], out[:, 1])
    assert np.abs(out1).max() > 1e-5        # the note sounded
    assert plug.engine.is_sustain_held()    # CC64 reached the engine
    # note_off under the pedal defers the release
    assert not np.isfinite(plug.engine._releases[0])


@pytest.mark.slow
def test_reset_restores_initial_behavior():
    eng = _mk()
    eng.warm_up()
    eng.note_on(60, 0.9)
    first = eng.render(eng.block)
    eng.reset()
    eng.note_on(60, 0.9)
    again = eng.render(eng.block)
    np.testing.assert_array_equal(first, again)
