"""Learned onset/pitch extractor (calib.onset_model) tests.

Training smoke on tiny synthetic data (loss decreases, shapes sane) plus
— when the shipped weights are installed — an end-to-end extraction check
on a two-note clip built from the f64 voice path.
"""

import numpy as np
import pytest

from openwurli_tpu.calib import onset_model as om

SR = 44100.0


def _decaying_tone(midi, sr, seconds, vel=0.8):
    """Cheap wurli-ish test tone: decaying fundamental + strong H2."""
    f0 = 440.0 * 2.0 ** ((midi - 69) / 12.0)
    t = np.arange(int(seconds * sr)) / sr
    env = np.exp(-3.0 * t) * np.minimum(t / 0.01, 1.0)
    return vel * env * (np.sin(2 * np.pi * f0 * t)
                        + 0.45 * np.sin(2 * np.pi * 2 * f0 * t)
                        + 0.15 * np.sin(2 * np.pi * 3 * f0 * t))


def _mixture(events, sr, seconds):
    audio = np.zeros(int(seconds * sr))
    for onset_s, midi in events:
        seg = _decaying_tone(midi, sr, 1.2)
        i0 = int(onset_s * sr)
        n = min(len(seg), len(audio) - i0)
        audio[i0:i0 + n] += seg[:n]
    return audio + 1e-5 * np.random.default_rng(0).normal(size=len(audio))


def test_features_shapes():
    feats = om.features(np.zeros(int(SR)), SR)
    assert feats.shape[1] == om.N_BINS
    xs = om.context_windows(feats)
    assert xs.shape == (len(feats), om.CONTEXT * om.N_BINS)
    assert np.isfinite(xs).all()


def test_training_reduces_loss():
    rng = np.random.default_rng(1)
    n = 600
    x = rng.normal(size=(n, om.CONTEXT * om.N_BINS)).astype(np.float32)
    y_on = (rng.random((n, om.N_NOTES)) < 0.02).astype(np.float32)
    y_note = (rng.random((n, om.N_NOTES)) < 0.1).astype(np.float32)
    # make labels learnable: plant a per-pitch signal in the features
    x[:, :om.N_NOTES] = y_on * 4.0
    x[:, om.N_BINS:om.N_BINS + om.N_NOTES] = y_note * 4.0

    import jax.numpy as jnp

    p0 = om.init_params(0)
    l0 = float(om.loss_fn({k: jnp.asarray(v) for k, v in p0.items()},
                          jnp.asarray(x), jnp.asarray(y_on),
                          jnp.asarray(y_note)))
    params = om.train(x, y_on, y_note, steps=150, batch=256, seed=0)
    l1 = float(om.loss_fn({k: jnp.asarray(v) for k, v in params.items()},
                          jnp.asarray(x), jnp.asarray(y_on),
                          jnp.asarray(y_note)))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < 0.7 * l0, (l0, l1)


def test_nn_extract_returns_empty_without_weights(tmp_path):
    out = om.nn_extract_notes(np.zeros(1000), SR,
                              params=None) if om.load_params(
        str(tmp_path / "missing.npz")) is None else None
    # only checks the no-weights contract when no weights are installed
    if om.load_params() is None:
        assert om.nn_extract_notes(np.zeros(1000), SR) == []


@pytest.mark.skipif(om.load_params() is None,
                    reason="trained weights not installed")
def test_nn_beats_spectral_on_fixture_mixtures():
    """The committed justification for method='auto' preferring the
    network (calib/notes.py): on a 4-instance mixture built from the
    shipped instrument-rendered fixture clips (staggered onsets with
    ringing overlap, gains down to −12 dB), the NN must recover every
    note and produce no more spurious detections than the spectral path
    (measured: NN 4/4 with 1 spurious, spectral 1/4 with 6 — its onsets
    land ~0.2 s early/late and low-note masking flips its pitches)."""
    import os

    from openwurli_tpu.calib import notes as notes_mod

    fix = os.path.join(os.path.dirname(__file__), "baselines",
                       "onset_test_clips.npz")
    with np.load(fix) as z:
        clips = {48: z["note48"], 67: z["note67"]}
        sr = float(z["sr"])
    events = [(0.4, 48, 0.0), (1.6, 67, -6.0), (2.9, 48, -12.0),
              (4.1, 67, 0.0)]
    audio = np.zeros(int(6.0 * sr))
    for onset_s, midi, gain_db in events:
        seg = clips[midi].astype(np.float64).copy()
        n_f = int(0.05 * sr)
        seg[-n_f:] *= np.linspace(1.0, 0.0, n_f)
        i0 = int(onset_s * sr)
        n = min(len(seg), len(audio) - i0)
        audio[i0:i0 + n] += 10.0 ** (gain_db / 20.0) * seg[:n]
    audio += 1e-5 * np.random.default_rng(0).normal(size=len(audio))

    def score(found):
        used, hits = set(), 0
        for onset_s, midi, _ in events:
            ok = [i for i, f in enumerate(found)
                  if i not in used and abs(f["onset_s"] - onset_s) < 0.1
                  and abs(f["midi_note"] - midi) <= 1]
            if ok:
                used.add(ok[0])
                hits += 1
        return hits, len(found) - len(used)

    nn_h, nn_fp = score(notes_mod.extract_notes(audio, sr,
                                                min_duration=0.15,
                                                method="nn"))
    sp_h, sp_fp = score(notes_mod.extract_notes(audio, sr,
                                                min_duration=0.15,
                                                method="spectral"))
    assert nn_h >= max(sp_h, 4), (nn_h, sp_h)
    assert nn_fp <= sp_fp, (nn_fp, sp_fp)


@pytest.mark.skipif(om.load_params() is None,
                    reason="trained weights not installed")
def test_shipped_weights_extract_two_notes():
    """Extraction on the model's actual domain: two instrument-rendered
    notes (fast-path clips shipped as a fixture) at staggered onsets."""
    import os

    fix = os.path.join(os.path.dirname(__file__), "baselines",
                       "onset_test_clips.npz")
    with np.load(fix) as z:
        clips = {48: z["note48"], 67: z["note67"]}
        sr = float(z["sr"])
    events = [(0.4, 48), (1.7, 67)]
    audio = np.zeros(int(3.4 * sr))
    for onset_s, midi in events:
        seg = clips[midi].astype(np.float64)
        n_f = int(0.05 * sr)
        seg[-n_f:] *= np.linspace(1.0, 0.0, n_f)
        i0 = int(onset_s * sr)
        n = min(len(seg), len(audio) - i0)
        audio[i0:i0 + n] += seg[:n]
    audio += 1e-5 * np.random.default_rng(0).normal(size=len(audio))
    found = om.nn_extract_notes(audio, sr, min_duration=0.15)
    assert len(found) >= 2, found
    for onset_s, midi in events:
        match = [f for f in found
                 if abs(f["onset_s"] - onset_s) < 0.1
                 and abs(f["midi_note"] - midi) <= 1]
        assert match, (onset_s, midi, found)
