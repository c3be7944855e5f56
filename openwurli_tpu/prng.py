"""Bit-exact integer PRNGs matching the reference's noise/jitter sources.

The −60 dB parity gate on jittered / noisy paths requires reproducing the
reference's PRNG streams exactly: an LCG (reed jitter + attack noise,
reed.rs:90-94 / hammer.rs:191-197) and Box-Muller initial draws
(reed.rs:126-134). All wrapping u32 arithmetic in jnp — vmappable, so 64
voices draw their decorrelated streams in parallel.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32
_LCG_MUL = _U32(1664525)
_LCG_ADD = _U32(1013904223)
# (u32::MAX as f64) / 2.0 — the reference's normalisation denominator.
_HALF_U32_MAX = 4294967295.0 / 2.0
SQRT_3 = 1.7320508080  # reference truncates at this precision (reed.rs:30)
TAU = 6.283185307179586


def lcg_next(state):
    """One LCG step: state' = state * 1664525 + 1013904223 (mod 2^32)."""
    return state.astype(_U32) * _LCG_MUL + _LCG_ADD


def lcg_to_unit(state):
    """Map an LCG state to [0, 1): (state >> 1) / (u32::MAX / 2)."""
    return (state >> _U32(1)).astype(jnp.float64) / _HALF_U32_MAX


def lcg_uniform_scaled(state):
    """(new_state, noise): uniform(-√3, √3) — unit variance (reed.rs:90-94)."""
    s = lcg_next(state)
    u = lcg_to_unit(s)
    return s, (u * 2.0 - 1.0) * SQRT_3


def lcg_signed_unit(state):
    """(new_state, noise): state as i32 / i32::MAX ∈ (-1, 1] (hammer.rs:191-197)."""
    s = lcg_next(state)
    signed = s.astype(jnp.int32).astype(jnp.float64)
    return s, signed / 2147483647.0


def box_muller_draws(seed, n):
    """Standard-normal draws via Box-Muller from an LCG stream.

    Matches the reference's note-on jitter init (reed.rs:126-134): for each
    draw, two LCG steps produce u1, u2; result = sqrt(-2 ln u1) cos(2π u2).
    seed: uint32 array (any shape). Returns (final_state, draws[..., n]).
    """
    state = jnp.maximum(jnp.asarray(seed).astype(_U32), _U32(1))
    draws = []
    for _ in range(n):
        state = lcg_next(state)
        u1 = lcg_to_unit(state)
        state = lcg_next(state)
        u2 = lcg_to_unit(state)
        r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-30)))
        draws.append(r * jnp.cos(TAU * u2))
    return state, jnp.stack(draws, axis=-1)
