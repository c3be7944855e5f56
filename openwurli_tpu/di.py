"""DI-path renderer: reed → pickup → output scale → 2×OS preamp @ 1 MΩ.

This is the chain the reference's ML pipeline and A/B comparisons render
(ml/render_model_notes.py:49-60 "DI path", tools/wurli_compare.py): the
voice path INCLUDING the preamp's ~14 dB gain, ~15.5 kHz rolloff and H2
contribution, but no power amp / speaker — matching the direct-injection
recording chain of the training corpus. Fully batched: pass arrays of
midis/velocities and the whole grid renders in one scan.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from openwurli_tpu import voice
from openwurli_tpu.circuits import dk_preamp as dk
from openwurli_tpu.ops import allpass


@lru_cache(maxsize=None)
def _pre_params(sr):
    return dk.make_params(sr * 2.0)


def preamp_di(audio, sr):
    """Run (n,) or (n, G) audio through the 2×-oversampled preamp at the
    quiescent R_ldr (1 MΩ — tremolo off). Returns the same shape."""
    audio = jnp.asarray(audio, dtype=jnp.float64)
    batch_shape = audio.shape[1:]
    pre_params = _pre_params(float(sr))
    g = jnp.broadcast_to(dk.ldr_conductance(1_000_000.0), batch_shape)

    @jax.jit
    def chain(xs):
        def body(carry, x):
            os_st, pre = carry
            os_st, (e, o) = allpass.up_step(os_st, x)
            pre, y0 = dk.step(pre_params, pre, g, e)
            pre, y1 = dk.step(pre_params, pre, g, o)
            os_st, y = allpass.down_step(os_st, y0, y1)
            return (os_st, pre), y

        carry = (allpass.init_state(batch_shape),
                 dk.init_state(pre_params, batch_shape))
        return jax.lax.scan(body, carry, xs)[1]

    return chain(audio)


def render_di(midis, velocities, duration, sr, mlp_enabled=True):
    """Batched DI render. midis/velocities scalar or (G,) → (n,) / (n, G)."""
    audio = voice.render_note(midis, velocities, duration, float(sr),
                              mlp_enabled=mlp_enabled)
    return np.asarray(preamp_di(audio, float(sr)))
