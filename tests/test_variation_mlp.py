"""Tests for deterministic variation hashing and MLP corrections."""

import jax.numpy as jnp
import numpy as np

from openwurli_tpu import mlp, variation


def test_variation_deterministic():
    assert float(variation.freq_detune(60)) == float(variation.freq_detune(60))
    np.testing.assert_array_equal(
        np.asarray(variation.mode_amplitude_offsets(60)),
        np.asarray(variation.mode_amplitude_offsets(60)),
    )


def test_variation_different_notes_differ():
    assert float(variation.freq_detune(60)) != float(variation.freq_detune(61))


def test_detune_range():
    d = np.asarray(variation.freq_detune(jnp.arange(33, 97)))
    assert (d > 0.99).all() and (d < 1.01).all()


def test_amplitude_range():
    offs = np.asarray(variation.mode_amplitude_offsets(jnp.arange(33, 97)))
    assert offs.shape == (64, 7)
    assert (offs > 0.90).all() and (offs < 1.10).all()


def test_mlp_identity_is_neutral():
    c = mlp.identity()
    assert (np.asarray(c.freq_offsets_cents) == 0).all()
    assert (np.asarray(c.decay_offsets) == 1).all()
    assert float(c.ds_correction) == 1.0


def test_mlp_infer_produces_corrections():
    c = mlp.infer(60, 0.8)
    has = (
        np.abs(np.asarray(c.freq_offsets_cents)).max() > 0.01
        or np.abs(np.asarray(c.decay_offsets) - 1).max() > 0.01
        or abs(float(c.ds_correction) - 1) > 0.01
    )
    assert has


def test_mlp_different_notes_differ():
    c40 = mlp.infer(40, 0.8)
    c80 = mlp.infer(80, 0.8)
    differ = (
        np.abs(np.asarray(c40.freq_offsets_cents)
               - np.asarray(c80.freq_offsets_cents)).max() > 0.001
        or np.abs(np.asarray(c40.decay_offsets)
                  - np.asarray(c80.decay_offsets)).max() > 0.001
    )
    assert differ


def test_mlp_corrections_within_bounds():
    midis = jnp.array([33, 48, 60, 72, 84, 96], dtype=jnp.float64)
    vels = jnp.array([0.2, 0.5, 0.8, 1.0])
    c = mlp.infer(midis[:, None], vels[None, :])
    assert c.freq_offsets_cents.shape == (6, 4, 5)
    assert np.abs(np.asarray(c.freq_offsets_cents)).max() <= 100.0
    d = np.asarray(c.decay_offsets)
    assert (d >= 0.3).all() and (d <= 3.0).all()
    ds = np.asarray(c.ds_correction)
    assert (ds >= 0.7).all() and (ds <= 1.2).all()


def test_mlp_fade_outside_training_range():
    # Far below the training range + fade zone: exact identity.
    c = mlp.infer(40, 0.8)
    assert (np.asarray(c.freq_offsets_cents) == 0).all()
    assert (np.asarray(c.decay_offsets) == 1).all()
    assert float(c.ds_correction) == 1.0
    # Mid-fade: partial corrections.
    c_edge = mlp.infer(59, 0.8)  # fade = (59-53)/12 = 0.5
    c_in = mlp.infer(70, 0.8)
    assert np.abs(np.asarray(c_in.freq_offsets_cents)).max() > 0
    assert np.isfinite(np.asarray(c_edge.freq_offsets_cents)).all()


def test_mlp_disabled_is_identity():
    c = mlp.infer(70, 0.8, enabled=False)
    assert (np.asarray(c.freq_offsets_cents) == 0).all()
    assert float(c.ds_correction) == 1.0
