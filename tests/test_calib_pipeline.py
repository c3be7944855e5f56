"""End-to-end calibration/ML pipeline test on synthetic recordings.

Renders known notes through the voice chain into a WAV "recording", then
runs the 7-stage pipeline: extraction finds the notes, harmonic features
are sane, residual assembly produces a trainable batch, and a short train
run reduces the loss. Also covers the Goertzel utilities and alias-audit
plateau metric (reference fixture values).
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from openwurli_tpu.calib import alias_audit, goertzel, harmonics, train
from openwurli_tpu.calib.pipeline import STAGES, main as pipeline_main

pytestmark = pytest.mark.slow  # multi-minute end-to-end renders on 1-core CPU

SR = 44100.0


def test_goertzel_recovers_known_sinusoid():
    f, amp = 1000.0, 0.7
    n = int(SR * 0.5)
    t = np.arange(n) / SR
    sig = jnp.asarray(amp * np.sin(2 * np.pi * f * t))
    mag = float(goertzel.dft_magnitude(sig, jnp.asarray([f]), SR)[0])
    assert abs(mag - amp) < 0.01


def test_goertzel_batched():
    n = int(SR * 0.2)
    t = np.arange(n) / SR
    sigs = jnp.asarray(np.stack([np.sin(2 * np.pi * 440 * t),
                                 0.5 * np.sin(2 * np.pi * 880 * t)]))
    mags = goertzel.dft_magnitude(sigs, jnp.asarray([440.0, 880.0]), SR)
    assert mags.shape == (2, 2)
    assert abs(float(mags[0, 0]) - 1.0) < 0.02
    assert abs(float(mags[1, 1]) - 0.5) < 0.02
    assert float(mags[0, 1]) < 0.05


def test_refine_f0():
    true_f = 443.7
    n = int(SR * 0.5)
    t = np.arange(n) / SR
    sig = jnp.asarray(np.sin(2 * np.pi * true_f * t))
    refined = float(goertzel.refine_f0(sig, 440.0, SR, span_hz=5.0,
                                       steps=101))
    assert abs(refined - true_f) < 0.2


def test_plateau_metric_fixtures():
    # Reference fixtures (alias_audit.rs tests): monotonic descent →
    # negative; pre-fix plateau signature → +5 dB.
    desc = [-50.0 - 5.0 * i for i in range(12)]
    delta, _ = alias_audit.plateau_metric(desc)
    assert delta < 0.0
    prefix = [0.0, -10.0, -20.0, -30.0, -50.0,
              -67.0, -63.0, -58.0, -58.0, -58.0, -61.0, -70.0]
    delta, from_h = alias_audit.plateau_metric(prefix)
    assert abs(delta - 5.0) < 0.001


def test_harmonic_features_on_synthetic_note():
    # Two-partial decaying tone: features must recover f0, H2/H1, decay.
    f0, sr = 220.0, SR
    n = int(sr * 1.6)
    t = np.arange(n) / sr
    sig = (np.exp(-t * 0.576) * np.sin(2 * np.pi * f0 * t)  # 5 dB/s decay
           + 0.1 * np.sin(2 * np.pi * 2 * f0 * t) * np.exp(-t * 1.0))
    f = harmonics.extract_note_features(sig, sr, f0 * 1.01)
    assert abs(f["f0_hz"] - f0) < 1.0
    es = f["windows"]["early_sustain"]
    assert abs((es[1] - es[0]) - 20 * np.log10(0.1)) < 2.0
    d = harmonics.decay_rate_db_per_s(f["decay_db"], f["decay_times"])
    assert 3.0 < d < 7.0, d


@pytest.mark.slow
def test_pipeline_end_to_end(tmp_path):
    from openwurli_tpu import voice
    from openwurli_tpu.io import wav

    # Synthetic "recording": three isolated notes with gaps.
    sr = 44100.0
    notes = [(60, 0.8), (67, 0.7), (72, 0.9)]
    chunks = [np.zeros(int(0.3 * sr))]  # leading silence before first onset
    for midi, vel in notes:
        audio = np.asarray(voice.render_note(midi, vel, 1.2, sr))
        audio = audio / max(np.abs(audio).max(), 1e-12) * 0.5
        chunks.append(audio)
        chunks.append(np.zeros(int(0.4 * sr)))
    recording = np.concatenate(chunks)

    input_dir = tmp_path / "recordings"
    data_dir = tmp_path / "ml_data"
    input_dir.mkdir()
    wav.write_wav(str(input_dir / "test.wav"), recording, sr, bits=24)

    pipeline_main(["--input-dir", str(input_dir), "--data-dir",
                   str(data_dir), "--through-stage", "6",
                   "--epochs", "50", "--model-seconds", "1.2"])

    found = json.load(open(data_dir / "notes.json"))
    assert len(found) >= 3, f"expected ≥3 notes, found {len(found)}"
    midis = sorted({n["midi_note"] for n in found})
    for midi, _ in notes:
        assert any(abs(m - midi) <= 1 for m in midis), (midi, midis)

    d = np.load(data_dir / "training_data.npz")
    assert d["inputs"].shape[1] == 2
    assert d["targets"].shape[1] == 11
    assert d["mask"].any(), "no valid training targets"

    assert os.path.exists(data_dir / "model_weights.npz")
    z = np.load(data_dir / "model_weights.npz")
    assert z["w1"].shape == (16, 2)


def test_train_reduces_loss():
    # Synthetic learnable mapping: targets linear in inputs.
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.uniform(0, 1, (64, 2)))
    w_true = rng.normal(size=(2, 11))
    targets = jnp.asarray(np.asarray(inputs) @ w_true * 3.0)
    batch = train.TrainBatch(
        inputs=inputs, targets=targets,
        mask=jnp.ones((64, 11), dtype=bool), weights=jnp.ones(64))

    targets_c, means, stds = train.standardise_targets(batch.targets,
                                                       batch.mask)
    batch = batch._replace(targets=targets_c)
    import jax

    weights = train.init_weights(jax.random.PRNGKey(0), 16, means, stds)
    init, step = train.make_train_step(1e-2)
    opt_state = init(weights)
    loss0 = float(train.masked_huber_loss(weights, batch))
    for _ in range(200):
        weights, opt_state, loss = step(weights, opt_state, batch)
    assert float(loss) < loss0 * 0.3, (loss0, float(loss))
