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
    # every stream rendered its own note (streams differ pairwise —
    # identical notes on two devices would collapse the spread)
    assert np.std(out[-1, :]) > 0.0
    assert len(np.unique(out[-1, :])) == 8


def test_render_grid_sharded_tile_crossing():
    """Sharded ≈ unsharded across multiple kernel tiles incl. a partial
    final tile (t=160, t_tile=64 → 3 tiles), 2 voices per stream — the
    state-carry across tile boundaries must survive shard_map.

    Tolerance, not bit equality: XLA lowers the chain's flat GE arrays
    differently for S_local=1 vs S=8 (shape-dependent vectorization /
    FMA contraction) and the chain amplifies low-order-bit deltas; a
    sharding BUG (garbled lanes, wrong collective) is O(1)."""
    mesh = meshlib.make_mesh(jax.devices("cpu")[:8])
    rng = np.random.default_rng(3)
    midis = rng.uniform(40.0, 90.0, size=(8, 2))
    t = 160
    out_sh = np.asarray(fast.render_grid_sharded(
        mesh, midis, 0.7, t / 44100.0, interpret=True, t_tile=64))
    out_1 = np.asarray(fast.render_grid(
        midis, 0.7, t / 44100.0, interpret=True, t_tile=64))
    assert out_sh.shape == out_1.shape == (t, 8)
    assert np.isfinite(out_sh).all()
    ref = np.abs(out_1).max()
    assert np.abs(out_sh - out_1).max() <= max(5e-2 * ref, 1e-6)


def test_render_grid_sharded_production_geometry():
    """Sharded ≈ unsharded at the PRODUCTION tile geometry the bench
    runs: T_TILE=512 chain tiles (12 of them — 0.77 s at 8 kHz), 16
    voices per stream → 128 lanes per device on the 8-device mesh.
    Round-3 gates only exercised 64-sample/t_tile=32 toy shapes; a
    sharding bug at real tile sizes or lane-row boundaries would have
    passed them."""
    from openwurli_tpu.kernels import mono_chain as mc

    mesh = meshlib.make_mesh(jax.devices("cpu")[:8])
    rng = np.random.default_rng(7)
    midis = rng.uniform(36.0, 95.0, size=(8, 16))
    sr = 8000.0
    t = 12 * mc.T_TILE
    out_sh = np.asarray(fast.render_grid_sharded(
        mesh, midis, 0.8, t / sr, sample_rate=sr, interpret=True,
        t_tile=mc.T_TILE))
    out_1 = np.asarray(fast.render_grid(
        midis, 0.8, t / sr, sample_rate=sr, interpret=True,
        t_tile=mc.T_TILE))
    assert out_sh.shape == out_1.shape == (t, 8)
    assert np.isfinite(out_sh).all()
    # real audio reached the end of every stream
    assert np.abs(out_1[-mc.T_TILE:, :]).max() > 1e-5
    # Head tight, tail garble-catch: shape-dependent FMA contraction
    # seeds ulp deltas that the chain's NR amplifies over render time
    # (parallel/dryrun.py phase-2 note); a sharding BUG is O(1) at t=0.
    ref = np.abs(out_1).max()
    assert np.abs(out_sh[:128] - out_1[:128]).max() <= max(5e-3 * ref,
                                                           1e-6)
    assert np.abs(out_sh - out_1).max() <= 0.25 * ref
    # BIT-level sharding gate: each device's shard_map body traces the
    # same program as an unsharded render of that shard alone (identical
    # local shapes) — shard_map must reproduce the standalone renders
    # exactly; any ulp of deviation is a sharding bug.
    oracle = np.concatenate(
        [np.asarray(fast.render_grid(midis[i:i + 1], 0.8, t / sr,
                                     sample_rate=sr, interpret=True,
                                     t_tile=mc.T_TILE))
         for i in range(8)], axis=1)
    np.testing.assert_array_equal(out_sh, oracle)


def test_render_grid_sharded_two_streams_per_device_bit_exact():
    """s_local=2: 16 streams over the 8-device mesh. Each device's body
    traces the SAME program as an unsharded render_grid of its 2-stream
    shard, so the sharded output must be BIT-identical to the 8
    standalone shard renders — the multi-stream-per-device analogue of
    the dryrun phase-2 gate (every other sharded test runs s_local=1)."""
    mesh = meshlib.make_mesh(jax.devices("cpu")[:8])
    rng = np.random.default_rng(19)
    midis = rng.uniform(40.0, 90.0, size=(16, 2))
    t = 256
    out_sh = np.asarray(fast.render_grid_sharded(
        mesh, midis, 0.7, t / 44100.0, interpret=True, t_tile=64))
    assert out_sh.shape == (t, 16)
    oracle = np.concatenate(
        [np.asarray(fast.render_grid(midis[2 * i:2 * i + 2], 0.7,
                                     t / 44100.0, interpret=True,
                                     t_tile=64))
         for i in range(8)], axis=1)
    np.testing.assert_array_equal(out_sh, oracle)


def test_voice_chunk_boundary_lane_independence():
    """The events-path voice bank renders >4096-lane banks in stitched
    VMEM chunks; voices are mutually independent, so lanes spanning the
    4096 chunk boundary must be BIT-IDENTICAL to the same voices
    rendered standalone. Catches chunk offset/stitch bugs at the real
    boundary (round-3 gates never crossed it)."""
    import jax.numpy as jnp

    from openwurli_tpu.kernels import voice_bank as vb

    lanes = 4224  # 4096 + 128: two chunks on the events path
    rng = np.random.default_rng(11)
    notes = rng.uniform(36.0, 95.0, lanes)
    vels = rng.uniform(0.4, 1.0, lanes)
    onsets = (rng.integers(0, 8, lanes) * 16).astype(np.float64)
    releases = np.where(rng.random(lanes) < 0.5,
                        256.0 + 16 * rng.integers(0, 8, lanes), np.inf)
    params, _ = vb.make_kernel_params(notes, vels, 44100.0,
                                      onsets=onsets, releases=releases)
    t = 512
    big = np.asarray(vb.render_voice_bank(jnp.asarray(params), t,
                                          interpret=True, events=True))
    lo, hi = 4096 - 64, 4096 + 64
    small = np.asarray(vb.render_voice_bank(
        jnp.asarray(params[..., lo:hi]), t, interpret=True, events=True))
    np.testing.assert_array_equal(big[:, lo:hi], small)


def test_render_grid_matches_composed_pipeline():
    """fast.render_grid == voice bank + sum + mono chain composed by
    hand (same kernels, interpret mode, tiny shapes)."""
    import jax.numpy as jnp

    from openwurli_tpu.kernels import mono_chain as mc
    from openwurli_tpu.kernels import voice_bank as vb

    midis = np.array([[60.0, 64.0]])
    t = 64
    out = fast.render_grid(midis, 0.8, t / 44100.0, interpret=True,
                           t_tile=32)
    params, _ = vb.make_kernel_params(midis.reshape(-1),
                                      np.full(2, 0.8), 44100.0)
    voices = vb.render_voice_bank(jnp.asarray(params), t, interpret=True)
    audio = voices[:, :2].sum(-1, keepdims=True)
    ctrl = mc.make_controls(44100.0, 1)
    state = mc.init_state(44100.0, 1)
    ref, _ = mc.render_tpu(44100.0, ctrl, state,
                           jnp.asarray(audio, jnp.float32),
                           interpret=True, t_tile=32)
    assert np.allclose(np.asarray(out), np.asarray(ref)[:t], atol=1e-6)
