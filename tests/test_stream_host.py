"""Streaming host: NDJSON protocol + MIDI pipe mode.

Each test runs the host in a SUBPROCESS: the engine's f64-scan compile
is the largest single XLA CPU compilation in the repo, and late in a
long suite run it can crash the in-process compiler (order-dependent
segfault observed at the same call site that passes in isolation) — a
fresh interpreter per test sidesteps the compiler-state dependence and
matches how the host actually runs (its own process on a pipe).
"""

import io
import json
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # engine renders on the contended CPU

REPO = os.path.join(os.path.dirname(__file__), "..")


def _run_host(args, stdin_bytes, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from openwurli_tpu import stream_host; stream_host.main()",
         *args],
        input=stdin_bytes, capture_output=True, timeout=timeout, env=env,
        cwd=REPO, check=False)


def test_serve_protocol_renders_pcm():
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
    stdin = "".join(json.dumps(c) + "\n" for c in cmds).encode()
    proc = _run_host(["--serve"], stdin)
    assert proc.returncode == 0, proc.stderr.decode()[-800:]
    pcm = np.frombuffer(proc.stdout, dtype=np.float32).reshape(-1, 2)
    assert pcm.shape == (4 * 256, 2)
    assert np.isfinite(pcm).all()
    assert np.abs(pcm).max() > 0.0
    # stereo fan-out is an exact mono copy
    assert np.array_equal(pcm[:, 0], pcm[:, 1])
    assert "error: unknown cmd 'bogus'" in proc.stderr.decode()


def test_midi_pipe_mode(tmp_path):
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

    proc = _run_host(["--midi", str(path), "--block", "2048",
                      "--tail", "0.1"], b"")
    assert proc.returncode == 0, proc.stderr.decode()[-800:]
    pcm = np.frombuffer(proc.stdout, dtype=np.float32).reshape(-1, 2)
    # song = 0.25 s (240 ticks @ 480 tpq, default 120 bpm) + 0.1 s tail
    assert pcm.shape[0] >= int(0.34 * 44100)
    assert np.isfinite(pcm).all()
    assert np.abs(pcm).max() > 1e-4
    assert "x realtime" in proc.stderr.decode()
