"""Hammer model: Gaussian dwell filter + attack-noise burst.

Dwell is a one-shot spectral shaping at note-on (finite felt-contact duration
low-passes the initial mode excitation). Attack noise is an exponentially
decaying bandpass-filtered burst (~15 ms) modelling the impact transient.
Behaviour-parity rebuild of crates/openwurli-dsp/src/hammer.rs; everything
batched over leading voice dims.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from openwurli_tpu import prng
from openwurli_tpu.ops import biquad

NOISE_FADE_IN_SAMPLES = 16


def dwell_time(velocity, fundamental_hz):
    """Hammer contact duration [s]: 0.75 cycles at ff → 1.0 at pp
    (Miessner US 2,932,231), clamped to [0.3, 20] ms. hammer.rs:26-29."""
    v = jnp.asarray(velocity, dtype=jnp.float64)
    f = jnp.asarray(fundamental_hz, dtype=jnp.float64)
    cycles = 0.75 + 0.25 * (1.0 - v)
    return jnp.clip(cycles / f, 0.0003, 0.020)


def onset_ramp_time(velocity, fundamental_hz):
    """Onset ramp [s]: 1 period at ff, 2 at pp, 2 ms floor. hammer.rs:53-57."""
    v = jnp.asarray(velocity, dtype=jnp.float64)
    f = jnp.asarray(fundamental_hz, dtype=jnp.float64)
    periods = 1.0 + 1.0 * (1.0 - v)
    return jnp.maximum(periods / f, 0.002)


def dwell_attenuation(velocity, fundamental_hz, mode_ratios):
    """Per-mode Gaussian dwell attenuation, normalised to mode 0.
    σ=8 in f·T units. hammer.rs:69-90. (..., NUM_MODES)."""
    f = jnp.asarray(fundamental_hz, dtype=jnp.float64)
    t_dwell = dwell_time(velocity, f)
    sigma_sq = 64.0
    ft = f[..., None] * mode_ratios * t_dwell[..., None]
    atten = jnp.exp(-ft * ft / (2.0 * sigma_sq))
    a0 = atten[..., 0:1]
    return jnp.where(a0 > 1e-30, atten / a0, atten)


class NoiseParams(NamedTuple):
    decay_per_sample: jnp.ndarray  # (...,)
    bpf: biquad.BiquadCoeffs  # each (...,)


class NoiseState(NamedTuple):
    amplitude: jnp.ndarray  # (...,)
    remaining: jnp.ndarray  # (...,) int32
    fade_in_remaining: jnp.ndarray  # (...,) int32
    bpf: biquad.BiquadState
    rng_state: jnp.ndarray  # (...,) uint32


def make_noise(velocity, fundamental_hz, sample_rate, seed):
    """AttackNoise note-on init (hammer.rs:126-146). Returns (params, state)."""
    v = jnp.asarray(velocity, dtype=jnp.float64)
    f = jnp.asarray(fundamental_hz, dtype=jnp.float64)
    v, f = jnp.broadcast_arrays(v, f)
    noise_amp = 0.025 * v * v
    tau = 0.003
    decay = jnp.full_like(v, jnp.exp(jnp.asarray(-1.0 / (tau * sample_rate))))
    duration = jnp.full(v.shape, int(0.015 * sample_rate), dtype=jnp.int32)
    center = jnp.clip(f * 5.0, 200.0, 2000.0)
    params = NoiseParams(
        decay_per_sample=decay,
        bpf=biquad.bandpass(center, 0.7, sample_rate),
    )
    state = NoiseState(
        amplitude=noise_amp,
        remaining=duration,
        fade_in_remaining=jnp.full(v.shape, NOISE_FADE_IN_SAMPLES, dtype=jnp.int32),
        bpf=biquad.init_state(v.shape),
        rng_state=jnp.broadcast_to(jnp.asarray(seed).astype(jnp.uint32), v.shape),
    )
    return params, state


def noise_step(params: NoiseParams, state: NoiseState):
    """One attack-noise sample for all voices; masked when burst is done.
    Mirrors hammer.rs:150-179 (raised-cosine 16-sample fade-in)."""
    active = state.remaining > 0
    fade = state.fade_in_remaining
    in_fade = fade > 0
    pos = (NOISE_FADE_IN_SAMPLES - fade).astype(jnp.float64)
    t = pos / NOISE_FADE_IN_SAMPLES
    env = jnp.where(in_fade, 0.5 * (1.0 - jnp.cos(jnp.pi * t)), 1.0)

    rng, noise = prng.lcg_signed_unit(state.rng_state)
    bpf_state, filtered = biquad.step(params.bpf, state.bpf, noise)

    out = jnp.where(active, state.amplitude * env * filtered, 0.0)

    new_state = NoiseState(
        amplitude=jnp.where(active, state.amplitude * params.decay_per_sample,
                            state.amplitude),
        remaining=jnp.maximum(state.remaining - active.astype(jnp.int32), 0),
        fade_in_remaining=jnp.where(active & in_fade, fade - 1, fade),
        bpf=biquad.BiquadState(
            z1=jnp.where(active, bpf_state.z1, state.bpf.z1),
            z2=jnp.where(active, bpf_state.z2, state.bpf.z2),
        ),
        rng_state=jnp.where(active, rng, state.rng_state),
    )
    return new_state, out
