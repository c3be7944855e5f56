"""Multi-chip sharding for calibration sweeps and training.

The reference is a single-process realtime plugin with no distributed
backend (SURVEY §2.6); the TPU build's multi-chip story is data parallelism
over the embarrassingly-parallel note × velocity grid: each chip renders a
shard of the grid (no cross-sample communication — notes are independent),
and training reductions ride ICI via XLA-inserted collectives (psum from a
mean over the sharded batch axis).

Built on jax.sharding.Mesh + NamedSharding: annotate the grid's batch axis,
let XLA partition the whole render/analyze/train pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices, dtype=object).reshape(-1), (DATA_AXIS,))


def shard_batch(mesh: Mesh, tree):
    """Place a pytree with a leading batch axis sharded across the mesh."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sharded_grid_render(mesh: Mesh, notes, velocities, duration_s,
                        sample_rate, mlp_enabled=False):
    """Render a flattened note×velocity grid sharded over the mesh.

    Returns (num_samples, G) audio with G sharded on the data axis. The
    voice scan is pure data parallelism — XLA partitions the batch dim and
    no collectives are needed until a reduction consumes the result.
    """
    from openwurli_tpu import voice

    g = jnp.asarray(notes, dtype=jnp.float64)
    v = jnp.asarray(velocities, dtype=jnp.float64)
    g, v = jnp.broadcast_arrays(g, v)
    g = shard_batch(mesh, g)
    v = shard_batch(mesh, v)

    @jax.jit
    def render(g, v):
        vparams, detuned = voice.note_on_params(
            g, v, sample_rate, mlp_enabled=mlp_enabled)
        state = voice.init_state(vparams, detuned, v, sample_rate,
                                 voice.default_note_seed(g))
        n = int(duration_s * sample_rate)
        _, out = voice.render(vparams, state, n)
        return out

    return render(g, v)
