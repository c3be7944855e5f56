"""Streaming host: NDJSON protocol + MIDI pipe mode (in-process)."""

import io
import json

import numpy as np
import pytest

from openwurli_tpu.stream_host import StreamHost, play_midi

pytestmark = pytest.mark.slow  # engine renders on the contended CPU


def test_serve_protocol_renders_pcm():
    host = StreamHost(44100.0, block=256)
    out = io.BytesIO()
    err = io.StringIO()
    cmds = [
        {"cmd": "init", "sample_rate": 44100, "block": 256},
        {"cmd": "param", "name": "volume", "value": 0.6},
        {"cmd": "events", "events": [
            {"offset": 0, "kind": "note_on", "note": 60, "velocity": 0.8},
            {"offset": 100, "kind": "note_on", "note": 64,
             "velocity": 0.7}]},
        {"cmd": "render", "blocks": 3},
        {"cmd": "events", "events": [
            {"offset": 0, "kind": "note_off", "note": 60}]},
        {"cmd": "render", "blocks": 1},
        {"cmd": "bogus"},
        {"cmd": "quit"},
    ]
    host.serve((json.dumps(c) + "\n" for c in cmds), out, err)
    pcm = np.frombuffer(out.getvalue(), dtype=np.float32).reshape(-1, 2)
    assert pcm.shape == (4 * 256, 2)
    assert np.isfinite(pcm).all()
    assert np.abs(pcm).max() > 0.0
    # stereo fan-out is an exact mono copy
    assert np.array_equal(pcm[:, 0], pcm[:, 1])
    assert "error: unknown cmd 'bogus'" in err.getvalue()


def test_midi_pipe_mode(tmp_path):
    import struct

    def vlq(n):
        out = [n & 0x7F]
        n >>= 7
        while n:
            out.append(0x80 | (n & 0x7F))
            n >>= 7
        return bytes(reversed(out))

    trk = b""
    last = 0
    for t, st, d1, d2 in [(0, 0x90, 60, 100), (240, 0x80, 60, 0)]:
        trk += vlq(t - last) + bytes([st, d1, d2])
        last = t
    trk += vlq(0) + b"\xff\x2f\x00"
    smf = (b"MThd" + struct.pack(">IHHH", 6, 0, 1, 480)
           + b"MTrk" + struct.pack(">I", len(trk)) + trk)
    path = tmp_path / "t.mid"
    path.write_bytes(smf)

    out = io.BytesIO()
    err = io.StringIO()
    rtf = play_midi(str(path), out, block=2048, tail_seconds=0.1, err=err)
    pcm = np.frombuffer(out.getvalue(), dtype=np.float32).reshape(-1, 2)
    assert pcm.shape[0] >= int(0.5 * 44100)
    assert np.isfinite(pcm).all()
    assert np.abs(pcm).max() > 1e-4
    assert rtf > 0
    assert "x realtime" in err.getvalue()
