"""Biquad filter — Audio EQ Cookbook coefficients, Direct Form II Transposed.

Functional, batched: coefficients and state are plain arrays; `step` is the
scan-body primitive, `process` runs a whole buffer under lax.scan, and every
function broadcasts over leading batch dimensions (64 voices of attack-noise
bandpass run as one vectorised scan).

Reference: crates/openwurli-dsp/src/filters.rs (melange-primitives Biquad —
identical RBJ cookbook coefficients, DF-II-T structure).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BiquadCoeffs(NamedTuple):
    b0: jnp.ndarray
    b1: jnp.ndarray
    b2: jnp.ndarray
    a1: jnp.ndarray
    a2: jnp.ndarray


class BiquadState(NamedTuple):
    z1: jnp.ndarray
    z2: jnp.ndarray


def _normalize(b0, b1, b2, a0, a1, a2):
    return BiquadCoeffs(b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0)


def bandpass(center_hz, q, sample_rate):
    """Bandpass, constant skirt gain (peak gain = Q)."""
    w0 = 2.0 * jnp.pi * jnp.asarray(center_hz, dtype=jnp.float64) / sample_rate
    sin_w0, cos_w0 = jnp.sin(w0), jnp.cos(w0)
    alpha = sin_w0 / (2.0 * q)
    b0 = sin_w0 / 2.0
    return _normalize(b0, jnp.zeros_like(b0), -b0,
                      1.0 + alpha, -2.0 * cos_w0, 1.0 - alpha)


def lowpass(cutoff_hz, q, sample_rate):
    w0 = 2.0 * jnp.pi * jnp.asarray(cutoff_hz, dtype=jnp.float64) / sample_rate
    sin_w0, cos_w0 = jnp.sin(w0), jnp.cos(w0)
    alpha = sin_w0 / (2.0 * q)
    b1 = 1.0 - cos_w0
    b0 = b1 / 2.0
    return _normalize(b0, b1, b0, 1.0 + alpha, -2.0 * cos_w0, 1.0 - alpha)


def highpass(cutoff_hz, q, sample_rate):
    w0 = 2.0 * jnp.pi * jnp.asarray(cutoff_hz, dtype=jnp.float64) / sample_rate
    sin_w0, cos_w0 = jnp.sin(w0), jnp.cos(w0)
    alpha = sin_w0 / (2.0 * q)
    b1 = -(1.0 + cos_w0)
    b0 = (1.0 + cos_w0) / 2.0
    return _normalize(b0, b1, b0, 1.0 + alpha, -2.0 * cos_w0, 1.0 - alpha)


def init_state(shape=()):
    z = jnp.zeros(shape, dtype=jnp.float64)
    return BiquadState(z, z)


def step(coeffs: BiquadCoeffs, state: BiquadState, x):
    """One DF-II-T step. Broadcasts over batch dims. Returns (state, y)."""
    y = coeffs.b0 * x + state.z1
    z1 = coeffs.b1 * x - coeffs.a1 * y + state.z2
    z2 = coeffs.b2 * x - coeffs.a2 * y
    return BiquadState(z1, z2), y


def process(coeffs: BiquadCoeffs, state: BiquadState, xs):
    """Filter a buffer: xs has time on axis 0 (time, ...batch). lax.scan."""

    def body(st, x):
        st, y = step(coeffs, st, x)
        return st, y

    return jax.lax.scan(body, state, xs)
