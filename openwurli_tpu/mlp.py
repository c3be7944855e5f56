"""Per-note MLP v2 parameter corrections.

A tiny MLP (2→16→16→11) runs once per note-on producing corrections to mode
frequencies (cents, H2-H6), decay rates, and pickup displacement scale.
Behaviour-parity rebuild of crates/openwurli-dsp/src/mlp_correction.rs; the
trained weights live as a data artifact (data/mlp_weights.npz, extracted from
the reference's baked constants — see tools/extract_mlp_weights.py) and are
regenerable by openwurli_tpu.calib.train.

TPU-native difference: `infer` is fully batched — pass (notes, velocities)
arrays and all note-on corrections for a calibration grid compute in one
matmul triple.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

MIDI_MIN = 21.0
MIDI_MAX = 108.0
N_OUTPUTS = 11
N_FREQ = 5
N_DECAY = 5
DS_IDX = 10

TRAIN_MIDI_LO = 65.0
TRAIN_MIDI_HI = 97.0
FADE_SEMITONES = 12.0

_DATA = os.path.join(os.path.dirname(__file__), "data", "mlp_weights.npz")


class MlpWeights(NamedTuple):
    """Weight pytree — plain arrays, so training/export is just array I/O."""

    w1: jnp.ndarray  # (16, 2)
    b1: jnp.ndarray  # (16,)
    w2: jnp.ndarray  # (16, 16)
    b2: jnp.ndarray  # (16,)
    w3: jnp.ndarray  # (11, 16)
    b3: jnp.ndarray  # (11,)
    target_means: jnp.ndarray  # (11,)
    target_stds: jnp.ndarray  # (11,)


def load_weights(path: str = _DATA) -> MlpWeights:
    # NumPy host constants, NOT jnp: this may first run inside a jit trace
    # (jnp conversion there returns tracers, which the module-level cache
    # would leak into later traces).
    z = np.load(path)
    return MlpWeights(
        *[np.asarray(z[k], dtype=np.float64)
          for k in ("w1", "b1", "w2", "b2", "w3", "b3",
                    "target_means", "target_stds")]
    )


_WEIGHTS = None


def default_weights() -> MlpWeights:
    global _WEIGHTS
    if _WEIGHTS is None:
        _WEIGHTS = load_weights()
    return _WEIGHTS


class MlpCorrections(NamedTuple):
    freq_offsets_cents: jnp.ndarray  # (..., 5)
    decay_offsets: jnp.ndarray  # (..., 5)
    ds_correction: jnp.ndarray  # (...,)


def identity(shape=()):
    return MlpCorrections(
        freq_offsets_cents=jnp.zeros(shape + (N_FREQ,), dtype=jnp.float64),
        decay_offsets=jnp.ones(shape + (N_DECAY,), dtype=jnp.float64),
        ds_correction=jnp.ones(shape, dtype=jnp.float64),
    )


def forward(weights: MlpWeights, midi_norm, vel_norm):
    """Raw denormalised MLP output. Batched over leading dims. (..., 11)."""
    x = jnp.stack(
        jnp.broadcast_arrays(jnp.asarray(midi_norm, dtype=jnp.float64),
                             jnp.asarray(vel_norm, dtype=jnp.float64)),
        axis=-1,
    )
    h1 = jnp.maximum(x @ weights.w1.T + weights.b1, 0.0)
    h2 = jnp.maximum(h1 @ weights.w2.T + weights.b2, 0.0)
    raw = h2 @ weights.w3.T + weights.b3
    return raw * weights.target_stds + weights.target_means


def infer(midi, velocity, weights: MlpWeights | None = None,
          enabled=True) -> MlpCorrections:
    """Batched note-on corrections with out-of-training-range fade.

    Outside MIDI 65-97 corrections fade linearly to identity over 12
    semitones (prevents wild extrapolation — mlp_correction.rs:61-140).
    `enabled` may be a bool or a broadcastable boolean array (per-voice).
    """
    if weights is None:
        weights = default_weights()
    m = jnp.asarray(midi, dtype=jnp.float64)
    v = jnp.asarray(velocity, dtype=jnp.float64)
    m, v = jnp.broadcast_arrays(m, v)

    fade = jnp.where(
        m < TRAIN_MIDI_LO,
        jnp.clip((m - (TRAIN_MIDI_LO - FADE_SEMITONES)) / FADE_SEMITONES, 0.0, 1.0),
        jnp.where(
            m > TRAIN_MIDI_HI,
            jnp.clip(((TRAIN_MIDI_HI + FADE_SEMITONES) - m) / FADE_SEMITONES, 0.0, 1.0),
            1.0,
        ),
    )
    fade = fade * jnp.asarray(enabled, dtype=jnp.float64)

    midi_norm = jnp.clip((m - MIDI_MIN) / (MIDI_MAX - MIDI_MIN), 0.0, 1.0)
    vel_norm = jnp.clip(v, 0.0, 1.0)
    raw = forward(weights, midi_norm, vel_norm)

    freq = jnp.clip(raw[..., :N_FREQ] * fade[..., None], -100.0, 100.0)
    raw_decay = jnp.clip(raw[..., N_FREQ:N_FREQ + N_DECAY], 0.3, 3.0)
    decay = 1.0 + (raw_decay - 1.0) * fade[..., None]
    raw_ds = jnp.clip(raw[..., DS_IDX], 0.7, 1.2)
    ds = 1.0 + (raw_ds - 1.0) * fade

    return MlpCorrections(freq, decay, ds)
