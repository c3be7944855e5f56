"""Fast batch renderer — the fused-Pallas throughput path as a library API.

Renders sustained chords/note-grids through the COMPLETE chain (voice
bank kernel → per-stream sum → mono-chain kernel) at ~150× realtime
aggregate on a TPU chip, vs minutes for the f64 XLA engine path. This is
the "batch renderer" execution mode of SURVEY §7 (calibration sweeps,
dataset rendering, serving); the f64 `engine.Engine` remains the
reference-accurate interactive path (note-off/damper/sustain semantics,
per-sample parameter smoothing).

Limitations vs the engine path (by design of the sustained-render mode):
notes start at t=0 and decay naturally (no note_off / damper / sustain
pedal events), controls are static per stream, and the chain runs in f32
deviation form (parity gates: tests/test_mono_chain.py).
"""

from __future__ import annotations

import numpy as np

from openwurli_tpu.kernels import mono_chain as mc


def render_grid(midis, velocities, seconds, sample_rate=44100.0,
                volume=0.5, depth=0.5, character=0.0, warm_seconds=0.0,
                interpret=False, t_tile=None):
    """Render S streams × V voices: midis/velocities (S, V) → (T, S) f32.

    Each stream s sounds its V notes simultaneously from t=0 through the
    full analog chain. volume/depth/character may be scalars or (S,).
    warm_seconds of silent chain settle are rendered (and discarded)
    before the notes start, mirroring WurliEngine::warm_up.
    """
    import jax
    import jax.numpy as jnp

    from openwurli_tpu.kernels import voice_bank as vb

    midis = np.atleast_2d(np.asarray(midis, dtype=np.float64))
    vels = np.broadcast_to(
        np.asarray(velocities, dtype=np.float64), midis.shape)
    s, v = midis.shape
    sr = float(sample_rate)
    t_tile = t_tile or mc.T_TILE
    t_total = int(round(seconds * sr))
    t_pad = -(-t_total // t_tile) * t_tile

    with jax.default_device(mc._cpu_device()):
        mc.pack_consts(sr)
        lanes = max(128, -(-s * v // 128) * 128)
        params, _ = vb.make_kernel_params(
            midis.reshape(-1), vels.reshape(-1), sr, lanes=lanes)
        ctrl = mc.make_controls(sr, s, volume=volume, depth=depth,
                                character=character)
        state = mc.init_state(sr, s)

    params = jnp.asarray(params)
    ctrl = jnp.asarray(ctrl)
    state = jnp.asarray(state)

    if warm_seconds > 0.0:
        t_warm = -(-int(warm_seconds * sr) // t_tile) * t_tile
        silence = jnp.zeros((t_warm, s), jnp.float32)
        _, state = mc.render_tpu(sr, ctrl, state, silence,
                                 interpret=interpret, t_tile=t_tile)

    voices = vb.render_voice_bank(
        params, t_pad, interpret=interpret,
        steady=vb.steady_limits(params))[:, :s * v]
    audio = voices.reshape(t_pad, s, v).sum(-1)
    out, _state = mc.render_tpu(sr, ctrl, state, audio,
                                interpret=interpret, t_tile=t_tile)
    return np.asarray(out[:t_total])


def render_chord(notes, velocity, seconds, sample_rate=44100.0, **kw):
    """Render one chord: notes (V,) → (T,) f32 mono."""
    out = render_grid(np.asarray(notes, dtype=np.float64)[None, :],
                      velocity, seconds, sample_rate, **kw)
    return out[:, 0]


def render_grid_sharded(mesh, midis, velocities, seconds,
                        sample_rate=44100.0, volume=0.5, depth=0.5,
                        character=0.0, interpret=False,
                        t_tile=None):
    """Multi-chip batch render: streams sharded over the mesh's data axis.

    Each device runs the fused kernels on its local stream shard — pure
    data parallelism over independent render streams (SURVEY §2.6: notes
    are independent; no cross-sample communication). midis (S, V) with S
    divisible by the mesh size. Returns (T, S) with S sharded.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from openwurli_tpu.kernels import voice_bank as vb
    from openwurli_tpu.parallel import mesh as meshlib

    midis = np.atleast_2d(np.asarray(midis, dtype=np.float64))
    vels = np.broadcast_to(
        np.asarray(velocities, dtype=np.float64), midis.shape)
    s, v = midis.shape
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    assert s % n_dev == 0, (s, n_dev)
    sr = float(sample_rate)
    t_tile = t_tile or mc.T_TILE
    t_total = int(round(seconds * sr))
    t_pad = -(-t_total // t_tile) * t_tile

    with jax.default_device(mc._cpu_device()):
        mc.pack_consts(sr)
        lanes_per_dev = max(128, -(-(s // n_dev) * v // 128) * 128)
        params_all = []
        for d in range(n_dev):
            sl = slice(d * (s // n_dev), (d + 1) * (s // n_dev))
            pp, _ = vb.make_kernel_params(
                midis[sl].reshape(-1), vels[sl].reshape(-1), sr,
                lanes=lanes_per_dev)
            params_all.append(np.asarray(pp))
        params = np.stack(params_all)          # (D, rows, 8, lanes)
        ctrl = mc.make_controls(sr, s, volume=volume, depth=depth,
                                character=character)
        state = mc.init_state(sr, s)

    axis = meshlib.DATA_AXIS
    sharded = NamedSharding(mesh, P(axis))
    ctrl_sh = jax.device_put(np.asarray(ctrl).T.copy(), sharded)  # (S, C)
    state_sh = jax.device_put(np.asarray(state).T.copy(), sharded)
    params_sh = jax.device_put(params, sharded)

    s_local = s // n_dev

    def per_device(params_d, ctrl_d, state_d):
        # (1, rows, 8, lanes), (S_loc, C), (S_loc, R) → local render
        voices = vb.render_voice_bank(params_d[0], t_pad,
                                      interpret=interpret)
        audio = voices[:, :s_local * v].reshape(t_pad, s_local, v).sum(-1)
        out, st = mc.render_tpu(sr, ctrl_d.T, state_d.T, audio,
                                interpret=interpret, t_tile=t_tile)
        return out.T  # (S_loc, T) so the batch axis stays leading

    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis)),
                   out_specs=P(axis), check_rep=False)
    out = fn(params_sh, ctrl_sh, state_sh)
    return jnp.swapaxes(out, 0, 1)[:t_total]
