"""2× polyphase IIR half-band oversampler — cascaded allpass branches.

Regalia-Mitra allpass-based half-band filter (~28 dB rejection at 30 kHz,
3 first-order sections per branch). Provides the antialiasing for the
preamp/power-amp nonlinear stages. Behaviour-parity rebuild of
crates/openwurli-dsp/src/oversampler.rs, as functional scan-body steps:
state is a (..., n_sections) array per branch, batched over engine
instances, so a whole calibration grid oversamples in one vector op.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# NumPy (not jnp) on purpose: module-level eager jnp constants would
# initialise a JAX backend at import time, before callers can pick one.
BRANCH_A_COEFFS = np.array(
    [0.036681502163648, 0.248030921580110, 0.643184620136480],
    dtype=np.float64,
)
BRANCH_B_COEFFS = np.array(
    [0.110377634768680, 0.420399304190880, 0.854640112701920],
    dtype=np.float64,
)
N_SECTIONS = 3


def _branch_step(coeffs, state, x):
    """Cascade of first-order allpass sections y=(a+z⁻¹)/(1+a z⁻¹).

    state: (..., 3); x: (...). Returns (state, y). The 3-section cascade is
    sequential by construction (each feeds the next) — unrolled statically.
    """
    new_state = []
    y = x
    for i in range(N_SECTIONS):
        a = coeffs[i]
        s = state[..., i]
        out = a * y + s
        new_state.append(y - a * out)
        y = out
    return jnp.stack(new_state, axis=-1), y


class OversamplerState(NamedTuple):
    up_a: jnp.ndarray  # (..., 3)
    up_b: jnp.ndarray  # (..., 3)
    down_a: jnp.ndarray  # (..., 3)
    down_b: jnp.ndarray  # (..., 3)
    down_delay: jnp.ndarray  # (...,)


def init_state(shape=()):
    z3 = jnp.zeros(shape + (N_SECTIONS,), dtype=jnp.float64)
    return OversamplerState(z3, z3, z3, z3, jnp.zeros(shape, dtype=jnp.float64))


def up_step(state: OversamplerState, x):
    """One base-rate input sample → two 2×-rate samples (even, odd)."""
    up_a, even = _branch_step(BRANCH_A_COEFFS, state.up_a, x)
    up_b, odd = _branch_step(BRANCH_B_COEFFS, state.up_b, x)
    return state._replace(up_a=up_a, up_b=up_b), (even, odd)


def down_step(state: OversamplerState, x_even, x_odd):
    """Two 2×-rate samples → one base-rate sample.

    Branch average with a one-sample delay on the B branch
    (oversampler.rs:126-139).
    """
    down_a, a = _branch_step(BRANCH_A_COEFFS, state.down_a, x_even)
    down_b, b = _branch_step(BRANCH_B_COEFFS, state.down_b, x_odd)
    y = (a + state.down_delay) * 0.5
    return state._replace(down_a=down_a, down_b=down_b, down_delay=b), y


def upsample_2x(state: OversamplerState, xs):
    """Buffer helper: xs (n, ...) → (state, (2n, ...))."""

    def body(st, x):
        st, (e, o) = up_step(st, x)
        return st, jnp.stack([e, o], axis=0)

    state, pairs = jax.lax.scan(body, state, xs)
    out = pairs.reshape((pairs.shape[0] * 2,) + pairs.shape[2:])
    return state, out


def downsample_2x(state: OversamplerState, xs):
    """Buffer helper: xs (2n, ...) → (state, (n, ...))."""
    pairs = xs.reshape((xs.shape[0] // 2, 2) + xs.shape[1:])

    def body(st, pair):
        st, y = down_step(st, pair[0], pair[1])
        return st, y

    return jax.lax.scan(body, state, pairs)
