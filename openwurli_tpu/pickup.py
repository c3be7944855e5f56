"""Electrostatic pickup — time-varying RC circuit with 1/(1-y) capacitance.

The reed modulates the capacitance of a +147 V charged plate: C(y)=C0/(1-y).
The RC circuit is discretised with the bilinear transform and a time-varying
capacitance, coupling the nonlinearity and the 2312 Hz HPF into one physical
system. Behaviour-parity rebuild of crates/openwurli-dsp/src/pickup.rs.

State is a single normalised charge per voice — the whole 64-voice bank
updates as one vector op per sample.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# R_total = 1M || 402K = 287K; C0 = 240 pF → τ = 68.88 µs, fc = 2312 Hz.
TAU_RC = 287.0e3 * 240.0e-12
PICKUP_SENSITIVITY = 1.8375  # V_hv * C0/(C0+Cp) = 147 * 3/240
PICKUP_MAX_Y = 0.98
PICKUP_KNEE_Y = 0.94
DEFAULT_DISPLACEMENT_SCALE = 0.85


class PickupParams(NamedTuple):
    beta: jnp.ndarray  # dt / (2 τ), scalar or (...,)
    displacement_scale: jnp.ndarray  # (...,)


class PickupState(NamedTuple):
    q: jnp.ndarray  # normalised charge, equilibrium 1.0


def make_params(sample_rate, displacement_scale=DEFAULT_DISPLACEMENT_SCALE):
    ds = jnp.asarray(displacement_scale, dtype=jnp.float64)
    beta = jnp.full_like(ds, 1.0 / sample_rate / (2.0 * TAU_RC))
    return PickupParams(beta=beta, displacement_scale=ds)


def init_state(shape=()):
    return PickupState(q=jnp.ones(shape, dtype=jnp.float64))


def soft_saturate(y):
    """C¹ smooth limit: identity below ±0.94, tanh-bend asymptoting ±0.98.

    Removes the derivative discontinuity of a hard clamp (HF 'tear' hash on
    chord-ff content). pickup.rs:72-80.
    """
    abs_y = jnp.abs(y)
    rng = PICKUP_MAX_Y - PICKUP_KNEE_Y
    sat = PICKUP_KNEE_Y + rng * jnp.tanh((abs_y - PICKUP_KNEE_Y) / rng)
    # sign-select rather than copysign: TPU's f64-emulation rewriter does
    # not implement the s64 bitcast that copysign's signbit lowers to.
    signed_sat = jnp.where(y >= 0.0, sat, -sat)
    return jnp.where(abs_y < PICKUP_KNEE_Y, y, signed_sat)


def step(params: PickupParams, state: PickupState, x):
    """One bilinear charge update. x = reed displacement (model units).

    q' = (q(1-α) + 2β)/(1+α) with α = β(1-y); out = (q'(1-y) - 1)·S.
    """
    y = soft_saturate(x * params.displacement_scale)
    one_minus_y = 1.0 - y
    alpha = params.beta * one_minus_y
    q_next = (state.q * (1.0 - alpha) + 2.0 * params.beta) / (1.0 + alpha)
    out = (q_next * one_minus_y - 1.0) * PICKUP_SENSITIVITY
    return PickupState(q=q_next), out
