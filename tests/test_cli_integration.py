"""CLI integration tests — the reference's reed-renderer binary tests.

Spawns the CLI as a subprocess (tools/reed-renderer/tests/integration.rs
pattern): WAV spec and sample counts, velocity→amplitude ordering,
determinism across runs.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from openwurli_tpu.io import wav

pytestmark = pytest.mark.slow  # multi-minute end-to-end renders on 1-core CPU

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from openwurli_tpu import cli; cli.main()",
         *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
        check=False)


def _cli_main(args):
    """In-process variant (fast path for repeated renders)."""
    from openwurli_tpu import cli

    cli.main(args)


@pytest.mark.slow
def test_reed_render_subprocess_wav_spec(tmp_path):
    out = str(tmp_path / "a4.wav")
    r = _run_cli(["reed-render", "-n", "69", "-v", "100",
                  "--duration", "0.3", "-o", out])
    assert r.returncode == 0, r.stderr[-500:]
    audio, sr = wav.read_wav(out)
    assert sr == 44100
    assert len(audio) == int(0.3 * 44100)
    assert np.abs(audio).max() > 0.1  # normalized render has signal


def test_reed_render_velocity_ordering(tmp_path):
    for vel in (40, 120):
        _cli_main(["reed-render", "-n", "60", "-v", str(vel),
                   "--duration", "0.15",
                   "-o", str(tmp_path / f"v{vel}.wav")])
    # Outputs are peak-normalized; compare via pre-normalization energy —
    # ordering shows in RMS structure. Instead render unnormalized through
    # the library for the actual check and use the files for spec checks.
    a40, _ = wav.read_wav(str(tmp_path / "v40.wav"))
    a120, _ = wav.read_wav(str(tmp_path / "v120.wav"))
    assert len(a40) == len(a120) == int(0.15 * 44100)

    import jax.numpy as jnp

    from openwurli_tpu import voice

    out = np.asarray(voice.render_note(
        jnp.array([60.0, 60.0]), jnp.array([40 / 127, 120 / 127]),
        0.15, 44100.0))
    assert np.abs(out[:, 1]).max() > np.abs(out[:, 0]).max()


def test_reed_render_deterministic(tmp_path):
    for k in range(2):
        _cli_main(["reed-render", "-n", "72", "-v", "90",
                   "--duration", "0.1", "-o", str(tmp_path / f"d{k}.wav")])
    a, _ = wav.read_wav(str(tmp_path / "d0.wav"))
    b, _ = wav.read_wav(str(tmp_path / "d1.wav"))
    np.testing.assert_array_equal(a, b)


def test_calibrate_csv_schema(tmp_path):
    out = str(tmp_path / "cal.csv")
    _cli_main(["calibrate", "--notes", "60", "--velocities", "127",
               "-o", out])
    lines = open(out).read().strip().splitlines()
    header = lines[0].split(",")
    assert header[:3] == ["midi", "note_name", "velocity"]
    assert "t5_rms_db" in header and "tanh_compression_db" in header
    assert len(lines) == 2
    row = lines[1].split(",")
    assert row[0] == "60" and row[1] == "C4"
