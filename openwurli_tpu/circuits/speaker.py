"""Wurlitzer 200A speaker cabinet — Hammerstein nonlinearity + HPF/LPF.

Polynomial waveshaper (BL asymmetry x², Kms hardening x³) → tanh Xmax
excursion limit → thermal voice-coil compression (τ=5 s) → HPF 30 Hz /
LPF 5.5 kHz, with a "character" morph from bypass (flat, linear) to
authentic. Behaviour-parity rebuild of crates/openwurli-dsp/src/speaker.rs,
functional and batched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from openwurli_tpu.ops import biquad

HPF_AUTHENTIC_HZ = 30.0
HPF_Q = 0.75
LPF_AUTHENTIC_HZ = 5500.0
LPF_Q = 0.707
HPF_BYPASS_HZ = 20.0
LPF_BYPASS_HZ = 20000.0
THERMAL_TAU = 5.0


class SpeakerParams(NamedTuple):
    sample_rate: jnp.ndarray
    thermal_alpha: jnp.ndarray


class SpeakerState(NamedTuple):
    hpf: biquad.BiquadState
    lpf: biquad.BiquadState
    thermal_state: jnp.ndarray  # (...,)


def make_params(sample_rate):
    sr = jnp.asarray(sample_rate, dtype=jnp.float64)
    return SpeakerParams(sample_rate=sr, thermal_alpha=1.0 / (THERMAL_TAU * sr))


def init_state(shape=()):
    return SpeakerState(
        hpf=biquad.init_state(shape),
        lpf=biquad.init_state(shape),
        thermal_state=jnp.zeros(shape, dtype=jnp.float64),
    )


def coeffs_for_character(character, sample_rate):
    """Log-interpolated filter cutoffs + polynomial coefficients.

    character 0.0 = bypass (flat, all nonlinearity off), 1.0 = authentic.
    """
    c = jnp.clip(jnp.asarray(character, dtype=jnp.float64), 0.0, 1.0)
    hpf_hz = HPF_BYPASS_HZ * (HPF_AUTHENTIC_HZ / HPF_BYPASS_HZ) ** c
    lpf_hz = LPF_BYPASS_HZ * (LPF_AUTHENTIC_HZ / LPF_BYPASS_HZ) ** c
    return {
        "hpf": biquad.highpass(hpf_hz, HPF_Q, sample_rate),
        "lpf": biquad.lowpass(lpf_hz, LPF_Q, sample_rate),
        "a2": 0.2 * c,
        "a3": 0.6 * c,
        "thermal_coeff": 2.0 * c,
        "character": c,
    }


def step(params: SpeakerParams, state: SpeakerState, coeffs, x):
    """One sample: waveshape → Xmax tanh → thermal → HPF → LPF."""
    a2, a3 = coeffs["a2"], coeffs["a3"]
    x2 = x * x
    shaped = (x + a2 * x2 + a3 * x2 * x) / (1.0 + a2 + a3)

    limited = jnp.where(coeffs["character"] < 0.001, shaped, jnp.tanh(shaped))

    thermal = state.thermal_state + (x2 - state.thermal_state) * params.thermal_alpha
    thermal_gain = 1.0 / (1.0 + coeffs["thermal_coeff"] * jnp.sqrt(thermal))

    hpf_state, filtered = biquad.step(coeffs["hpf"], state.hpf,
                                      limited * thermal_gain)
    lpf_state, out = biquad.step(coeffs["lpf"], state.lpf, filtered)
    return SpeakerState(hpf_state, lpf_state, thermal), out
