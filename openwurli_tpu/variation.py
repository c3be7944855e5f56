"""Deterministic per-note variation — hash-based pseudo-random offsets.

Each physical reed has slightly different tuning / solder mass / mounting, so
note 60 always sounds the same but differs from note 61. Bit-exact rebuild of
the reference hash (crates/openwurli-dsp/src/variation.rs) using jnp uint32
wrapping arithmetic, vectorised over MIDI-note arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from openwurli_tpu.tables import NUM_MODES

_U32 = jnp.uint32


def hash_f64(midi, seed):
    """FNV-style deterministic hash → float64 in [0, 1).

    midi: integer array (any shape); seed: python int or uint32 array.
    Matches reference variation.rs:10-19 exactly (wrapping u32 semantics).
    """
    h = jnp.asarray(2166136261, dtype=_U32)
    m = jnp.asarray(midi).astype(_U32)
    s = jnp.asarray(seed).astype(_U32)
    h = h ^ m
    h = h * _U32(16777619)
    h = h ^ s
    h = h * _U32(16777619)
    h = h ^ (h >> _U32(16))
    h = h * _U32(2654435769)
    return (h & _U32(0x00FF_FFFF)).astype(jnp.float64) / 16777216.0


def freq_detune(midi):
    """Frequency detune multiplier in [1-max, 1+max], max = ±3 cents."""
    r = hash_f64(midi, 0xDEAD) * 2.0 - 1.0
    return 1.0 + r * 0.00173


def mode_amplitude_offsets(midi):
    """Per-mode amplitude multipliers in [0.92, 1.08]. (..., NUM_MODES)."""
    m = jnp.asarray(midi)
    seeds = jnp.asarray(0xBEEF, dtype=_U32) + jnp.arange(NUM_MODES, dtype=_U32)
    r = hash_f64(m[..., None], seeds) * 2.0 - 1.0
    return 1.0 + r * 0.08
