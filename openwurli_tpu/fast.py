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
                volume=0.5, depth=0.5, character=0.0, warm_seconds=0.0):
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
    t_total = int(round(seconds * sr))
    t_pad = -(-t_total // mc.T_TILE) * mc.T_TILE

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
        t_warm = -(-int(warm_seconds * sr) // mc.T_TILE) * mc.T_TILE
        silence = jnp.zeros((t_warm, s), jnp.float32)
        _, state = mc.render_tpu(sr, ctrl, state, silence)

    voices = vb.render_voice_bank(params, t_pad)[:, :s * v]
    audio = voices.reshape(t_pad, s, v).sum(-1)
    out, _state = mc.render_tpu(sr, ctrl, state, audio)
    return np.asarray(out[:t_total])


def render_chord(notes, velocity, seconds, sample_rate=44100.0, **kw):
    """Render one chord: notes (V,) → (T,) f32 mono."""
    out = render_grid(np.asarray(notes, dtype=np.float64)[None, :],
                      velocity, seconds, sample_rate, **kw)
    return out[:, 0]
