"""Fast batch renderer — the fused-Pallas throughput path as a library API.

Renders sustained chords/note-grids through the COMPLETE chain (voice
bank kernel → per-stream sum → mono-chain kernel) at ~150× realtime
aggregate on a TPU chip, vs minutes for the f64 XLA engine path. This is
the "batch renderer" execution mode of SURVEY §7 (calibration sweeps,
dataset rendering, serving); the f64 `engine.Engine` remains the
reference-accurate interactive path (note-off/damper/sustain semantics,
per-sample parameter smoothing).

Two entry points:
  * render_grid / render_chord — sustained notes from t=0 (calibration
    sweeps, dataset rendering);
  * render_events / render_midi_file — full MIDI event schedules
    (note-on sample, note-off → damper, sustain pedal resolved host-side
    into effective release samples) rendered block-streamed with state
    carried across blocks, so arbitrary-length songs never materialise a
    whole (T, V) voice array.

Remaining differences vs the engine path: controls are static per stream
(no per-sample smoothing ramps), voice allocation is append-one-lane-per
-note-instance instead of 64-slot stealing (no steal crossfades — lanes
are unlimited), note-on samples quantize to the 16-sample jitter grid,
and the chain runs in f32 deviation form (parity gates:
tests/test_mono_chain.py, tests/test_fast_events.py).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from openwurli_tpu.kernels import mono_chain as mc


def render_grid(midis, velocities, seconds, sample_rate=44100.0,
                volume=0.5, depth=0.5, character=0.0, warm_seconds=0.0,
                interpret=False, t_tile=None, noise_level=0.0):
    """Render S streams × V voices: midis/velocities (S, V) → (T, S) f32.

    Each stream s sounds its V notes simultaneously from t=0 through the
    full analog chain. volume/depth/character may be scalars or (S,).
    warm_seconds of silent chain settle are rendered (and discarded)
    before the notes start, mirroring WurliEngine::warm_up.
    noise_level > 0 compiles the thermal-noise chain variant (reference
    "Authentic Noise"/"Noise Level" params; kernels/mono_chain.py
    preamp_step) with that runtime gain.
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
                                character=character,
                                noise_level=noise_level)
        state = mc.init_state(sr, s)

    nz = bool(np.any(np.asarray(noise_level) > 0.0))
    params = jnp.asarray(params)
    ctrl = jnp.asarray(ctrl)
    state = jnp.asarray(state)

    if warm_seconds > 0.0:
        t_warm = -(-int(warm_seconds * sr) // t_tile) * t_tile
        silence = jnp.zeros((t_warm, s), jnp.float32)
        _, state = mc.render_tpu(sr, ctrl, state, silence,
                                 interpret=interpret, t_tile=t_tile,
                                 noise=nz)

    voices = vb.render_voice_bank(
        params, t_pad, interpret=interpret, events=False,
        steady=vb.steady_limits(params))[:, :s * v]
    audio = voices.reshape(t_pad, s, v).sum(-1)
    out, _state = mc.render_tpu(sr, ctrl, state, audio,
                                interpret=interpret, t_tile=t_tile,
                                noise=nz)
    return np.asarray(out[:t_total])


def render_chord(notes, velocity, seconds, sample_rate=44100.0, **kw):
    """Render one chord: notes (V,) → (T,) f32 mono."""
    out = render_grid(np.asarray(notes, dtype=np.float64)[None, :],
                      velocity, seconds, sample_rate, **kw)
    return out[:, 0]


def schedule_events(events, sample_rate):
    """Resolve a MIDI event stream into per-voice-instance schedules.

    events: iterable of openwurli_tpu.io.midi_file.Event (kind "on" /
    "off" / "sustain", absolute time_s). Mirrors the engine's sustain
    semantics (engine.rs:299-374): note-off while the pedal is held
    sustains the voice until pedal release; re-striking a ringing note
    damps the old voice at the new note-on.

    Returns (midis, vels, onsets, releases) as float64 arrays — onset /
    release are sample indices (release = np.inf when never damped).
    """
    sr = float(sample_rate)
    midis, vels, onsets, releases = [], [], [], []
    ringing = {}          # note → lane of the currently-ringing instance
    pending = set()       # lanes held only by the sustain pedal
    sustain = False
    for ev in events:
        t = ev.time_s * sr
        if ev.kind == "on":
            old = ringing.get(ev.note)
            if old is not None and releases[old] == np.inf:
                releases[old] = t       # damp the re-struck voice
                pending.discard(old)
            lane = len(midis)
            midis.append(float(ev.note))
            vels.append(ev.velocity / 127.0)
            onsets.append(t)
            releases.append(np.inf)
            ringing[ev.note] = lane
        elif ev.kind == "off":
            lane = ringing.get(ev.note)
            if lane is not None and releases[lane] == np.inf:
                if sustain:
                    pending.add(lane)
                else:
                    releases[lane] = t
        elif ev.kind == "sustain":
            held = ev.velocity >= 64
            if sustain and not held:
                for lane in pending:
                    releases[lane] = t
                pending.clear()
            sustain = held
    return (np.asarray(midis), np.asarray(vels), np.asarray(onsets),
            np.asarray(releases))


def render_events(midis, velocities, onsets, releases, seconds,
                  sample_rate=44100.0, volume=0.5, depth=0.5,
                  character=0.0, warm_seconds=0.6, block_seconds=2.0,
                  interpret=False, t_tile=None, noise_level=0.0):
    """Event-scheduled single-stream render → (T,) f32 mono.

    midis/velocities/onsets/releases: per-voice-instance schedules (from
    schedule_events, or hand-built); onset/release in samples. Renders in
    carried-state blocks: memory stays O(block × lanes) regardless of
    song length.
    """
    import jax
    import jax.numpy as jnp

    from openwurli_tpu.kernels import voice_bank as vb

    sr = float(sample_rate)
    t_tile = t_tile or mc.T_TILE
    t_total = int(round(seconds * sr))
    t_blk = max(t_tile, int(round(block_seconds * sr)) // t_tile * t_tile)
    n_blocks = -(-t_total // t_blk)

    with jax.default_device(mc._cpu_device()):
        mc.pack_consts(sr)
        params, _ = vb.make_kernel_params(
            np.asarray(midis, dtype=np.float64),
            np.asarray(velocities, dtype=np.float64), sr,
            onsets=onsets, releases=releases)
        ctrl = mc.make_controls(sr, 1, volume=volume, depth=depth,
                                character=character,
                                noise_level=noise_level)
        state = mc.init_state(sr, 1)
        vstate = vb.init_bank_state(params)
    nz = float(noise_level) > 0.0

    # Schedule facts are resolved ONCE host-side; the per-block kernel
    # calls must not re-read params off the device (tunnel transfers).
    params_np = np.asarray(params)
    events = vb._has_events(params_np)
    min_rel = vb._min_release(params_np) if events else vb.NEVER
    params = jnp.asarray(params)
    ctrl = jnp.asarray(ctrl)
    state = jnp.asarray(state)
    steady = vb.steady_limits(params_np)

    if warm_seconds > 0.0:
        t_warm = -(-int(warm_seconds * sr) // t_tile) * t_tile
        silence = jnp.zeros((t_warm, 1), jnp.float32)
        _, state = mc.render_tpu(sr, ctrl, state, silence,
                                 interpret=interpret, t_tile=t_tile,
                                 noise=nz)

    # One jitted program per block SHAPE (n0 is traced, so every block
    # reuses the same compile): the round-4 eager per-block form paid
    # several ~27 ms tunnel dispatches per block (state init, lane sum,
    # kernel calls) plus a per-block audio transfer. params/ctrl are
    # ARGUMENTS (not closure constants) and the stages are separated by
    # optimization barriers: in interpret mode the kernels inline as
    # plain XLA ops, and without both measures XLA folds/fuses them
    # differently here than in FastEngine's block program — ulp-level
    # divergence that breaks the engine-vs-batch bit-exactness gate.
    # On the real TPU (opaque pallas custom calls) both are no-ops.
    @jax.jit
    def _block(params, ctrl, vstate, state, n0):
        voices, vstate = vb.render_voice_bank(
            params, t_blk, interpret=interpret, steady=steady,
            state=vstate, n0=n0, return_state=True,
            events=events, min_release=min_rel)
        voices, vstate = jax.lax.optimization_barrier((voices, vstate))
        audio = voices.sum(-1, keepdims=True)
        audio = jax.lax.optimization_barrier(audio)
        out, state = mc.render_tpu(sr, ctrl, state, audio,
                                   interpret=interpret, t_tile=t_tile,
                                   noise=nz)
        return out[:, 0], vstate, state

    outs = []
    for b in range(n_blocks):
        out, vstate, state = _block(params, ctrl, vstate, state,
                                    jnp.asarray(b * t_blk, jnp.int32))
        outs.append(out)  # device arrays; one host transfer at the end
    return np.asarray(jnp.concatenate(outs))[:t_total]


VOICE_TIMEOUT_S = 10.0  # reference: damping voices retire 10 s after RELEASE


def _voice_lifetimes(midis, onsets, releases, sr, t_total):
    """Per-voice audible lifetime in samples, instance-local.

    Mirrors Voice::is_silent (reference voice.rs:181-188): a voice ends
    at its envelope's −80 dB point — natural decay for never-damped
    voices (tables.rs:390-395 law, 0.005·f^1.22 dB/s floored at 3), or
    the damper decay after release (reed.rs:191-216 slowest-mode rate
    plus the ramp) — with the reference's 10 s post-RELEASE safety
    timeout as a hard cap on the damper tail. Never-released voices are
    NOT retired at 10 s: the reference only times out voices that are
    DAMPING (is_damping && release_seconds > 10, voice.rs:183-185), so
    sustained notes ring to their natural decay floor (≤ 80/3 ≈ 27 s).
    """
    m = np.asarray(midis, dtype=np.float64)
    f = 440.0 * 2.0 ** ((m - 69.0) / 12.0)
    decay_db_s = np.maximum(0.005 * f ** 1.22, 3.0)
    ring = (80.0 / decay_db_s + 0.1) * sr          # natural −80 dB point
    rel_local = np.asarray(releases, dtype=np.float64) - onsets
    # slowest damper mode: amplitude rate base_rate/s → −80 dB at
    # ln(10^4)/base_rate ≈ 9.22/base_rate, plus the felt ramp-in
    base_rate = np.maximum(55.0 * 2.0 ** ((m - 60.0) / 24.0), 0.5)
    ramp_s = np.select([m < 48.0, m < 72.0], [0.050, 0.025], 0.008)
    tail = np.minimum(ramp_s + 9.22 / base_rate, VOICE_TIMEOUT_S) * sr
    damped = np.logical_and(rel_local < ring, m < 92.0)  # top 5: no damper
    life = np.where(damped, np.minimum(rel_local + tail, ring), ring)
    return np.minimum(t_total - onsets, life).astype(np.int64)


def _song_voices(midis, velocities, onsets, rel_local, lens, t_total, sr,
                 interpret, t_tile):
    """Voices in instance-local time → device shift-and-sum → (T, 1).

    Every note starts at its own t=0 (voices are mutually independent),
    so one wide kernel call of max(lens) samples covers the whole song;
    _scatter_voices then shifts each column to its onset and truncates
    it at its lifetime (the −80 dB point, matching the reference's
    is_silent retirement).
    """
    import jax
    import jax.numpy as jnp

    from openwurli_tpu.kernels import voice_bank as vb

    n = len(midis)
    t_voice = -(-int(lens.max()) // t_tile) * t_tile
    with jax.default_device(mc._cpu_device()):
        params, _ = vb.make_kernel_params(
            np.asarray(midis, dtype=np.float64),
            np.asarray(velocities, dtype=np.float64), sr,
            onsets=np.zeros(n), releases=rel_local)
    params_np = np.asarray(params)
    voices = vb.render_voice_bank(
        jnp.asarray(params), t_voice, interpret=interpret,
        events=vb._has_events(params_np),
        min_release=vb._min_release(params_np),
        steady=vb.steady_limits(params_np))
    onset_arr = jnp.asarray(np.asarray(onsets).astype(np.int32))
    len_arr = jnp.asarray(np.asarray(lens).astype(np.int32))
    return _scatter_voices(voices[:, :n], onset_arr, len_arr, t_total,
                           t_voice)


def render_events_parallel(midis, velocities, onsets, releases, seconds,
                           sample_rate=44100.0, volume=0.5, depth=0.5,
                           character=0.0, segments=128, warm_seconds=1.0,
                           interpret=False, t_tile=None, noise_level=0.0):
    """Event-scheduled single-song render, TIME-PARALLEL → (T,) f32.

    The serial fast path (render_events) is bound by the mono chain's
    per-sample recurrence at S=1 — the one shape the wide kernels can't
    help. This renderer turns the song's time axis into the batch axis:

      1. voices render in INSTANCE-LOCAL time (every note starts at its
         own t=0, voices are mutually independent) — one wide kernel
         call, then a device-side shift-and-sum into the song;
      2. the autonomous tremolo — the only chain component with
         unbounded memory (an oscillator never forgets its phase) — is
         pre-rolled serially by a tiny dedicated kernel
         (mono_chain.trem_preroll, ~1 µs/update) and sampled at segment
         boundaries;
      3. the chain renders `segments` overlapping time-segments as
         parallel streams: each segment gets warm_seconds of its
         preceding audio as warm-up (every non-tremolo component —
         preamp bias, PA rails, speaker — settles well inside 1 s) with
         the exact tremolo state injected, and the warm-up samples are
         discarded.

    Semantically matches render_events(warm_seconds=same) within the
    fast path's parity gates; segment boundaries carry only the chain's
    own warm-up residual (gated in tests/test_fast_events.py). Voice
    retirement follows the reference's is_silent rule (voice.rs:181-188,
    see _voice_lifetimes): each voice renders to its −80 dB point —
    natural decay if never damped, damper decay (capped 10 s) after
    release — so the only divergence from the serial path, which never
    truncates, is below the −80 dB silence threshold.
    """
    import jax
    import jax.numpy as jnp

    from openwurli_tpu.kernels import voice_bank as vb

    sr = float(sample_rate)
    t_tile = t_tile or mc.T_TILE
    t_total = int(round(seconds * sr))
    n = len(midis)
    assert n > 0

    # segment geometry (all multiples of the kernel tile). warm rounds
    # UP exactly like render_events' warm pre-roll: the tremolo phase
    # advances warm+t by construction in both paths, so any difference
    # in the rounded warm length shifts the two tremolo trajectories
    # against each other — at production tiles (512) the old round-DOWN
    # misaligned them by up to one tile and cost ~25 dB of parity.
    per = -(-t_total // int(segments))
    seg_len = max(t_tile, -(-per // t_tile) * t_tile)
    n_seg = -(-t_total // seg_len)
    warm = -(-int(round(warm_seconds * sr)) // t_tile) * t_tile
    warm = max(t_tile, warm)

    onsets = np.asarray(onsets, dtype=np.float64)
    onsets = np.round(onsets / 16.0) * 16.0
    releases = np.asarray(releases, dtype=np.float64).copy()
    releases[~np.isfinite(releases)] = vb.NEVER

    # ── 1. voices in instance-local time ─────────────────────────────
    rel_local = np.where(releases >= vb.NEVER, vb.NEVER,
                         releases - onsets)
    lens = _voice_lifetimes(midis, onsets, releases, sr, t_total)

    with jax.default_device(mc._cpu_device()):
        mc.pack_consts(sr)
        ctrl1 = mc.make_controls(sr, 1, volume=volume, depth=depth,
                                 character=character)
        ctrl = mc.make_controls(sr, n_seg, volume=volume, depth=depth,
                                character=character,
                                noise_level=noise_level)
        state = mc.init_state(sr, n_seg)

    # shift-and-sum on device: song[o_i + t] += voice_i[t]
    audio = _song_voices(midis, velocities, onsets, rel_local, lens,
                         t_total, sr, interpret, t_tile)

    # ── 2. tremolo pre-roll, captured at segment starts ──────────────
    rows, caps = mc.trem_preroll(sr, ctrl1, n_seg, seg_len,
                                 interpret=interpret)
    state = np.asarray(state)
    for name, a, b, ca, cb in rows:
        state[a:b, :] = caps[:, ca:cb].T

    # ── 3. segmented chain ───────────────────────────────────────────
    audio_seg = _segment_windows(audio, n_seg, seg_len, warm)
    out_seg, _ = mc.render_tpu(sr, ctrl, jnp.asarray(state), audio_seg,
                               interpret=interpret, t_tile=t_tile,
                               noise=float(noise_level) > 0.0)
    out = jnp.transpose(out_seg[warm:, :]).reshape(-1)
    return np.asarray(out[:t_total])


@functools.partial(jax.jit, static_argnums=(3, 4))
def _scatter_voices(voices, onset_arr, len_arr, t_total, t_voice):
    """sum_i shift(voices[:, i], onset_i) → (t_total,) f32, on device."""
    import jax
    import jax.numpy as jnp

    # Leading zeros make start = t_total − onset index the voice's t=0;
    # TRAILING zeros keep every slice in bounds: the max start is
    # t_total (onset 0), so stacked must be ≥ 2·t_total long — without
    # the tail pad, any onset < t_total − t_voice made dynamic_slice
    # CLAMP the start and the voice contributed pure silence.
    pad = jnp.zeros((t_total, voices.shape[1]), jnp.float32)
    tail = jnp.zeros((max(t_total - t_voice, 0), voices.shape[1]),
                     jnp.float32)
    stacked = jnp.concatenate([pad, voices, tail], axis=0)

    def body(acc, iv):
        col, onset, ln = iv
        t = jnp.arange(t_total, dtype=jnp.int32)
        local = t - onset
        win = jax.lax.dynamic_slice(
            col, (t_total - onset,), (t_total,))
        keep = jnp.logical_and(local >= 0, local < ln)
        return acc + jnp.where(keep, win, 0.0), None

    acc0 = jnp.zeros((t_total,), jnp.float32)
    acc, _ = jax.lax.scan(
        body, acc0,
        (jnp.transpose(stacked), onset_arr, len_arr))
    return acc.reshape(t_total, 1)


def _segment_windows(audio, n_seg, seg_len, warm):
    """(T, 1) song → (warm+seg_len, n_seg) overlapping segment columns."""
    import jax
    import jax.numpy as jnp

    flat = audio.reshape(-1)
    t_need = n_seg * seg_len
    flat = jnp.concatenate([
        jnp.zeros((warm,), jnp.float32), flat,
        jnp.zeros((max(t_need - flat.shape[0], 0),), jnp.float32)])
    cols = [jax.lax.dynamic_slice(flat, (k * seg_len,), (warm + seg_len,))
            for k in range(n_seg)]
    return jnp.stack(cols, axis=1)


def render_midi_file(path, sample_rate=44100.0, tail_seconds=2.0,
                     parallel=True, **kw):
    """Render a Standard MIDI File through the fused-kernel fast path.

    parallel=True uses the time-parallel renderer (the fast path for a
    single song on real hardware); False falls back to the serial
    block-streamed path."""
    from openwurli_tpu.io import midi_file

    events, total_s = midi_file.load_events(path)
    midis, vels, onsets, releases = schedule_events(events, sample_rate)
    if midis.size == 0:
        return np.zeros(0, dtype=np.float32)
    if parallel:
        return render_events_parallel(midis, vels, onsets, releases,
                                      total_s + tail_seconds, sample_rate,
                                      **kw)
    return render_events(midis, vels, onsets, releases,
                         total_s + tail_seconds, sample_rate, **kw)


def render_grid_sharded(mesh, midis, velocities, seconds,
                        sample_rate=44100.0, volume=0.5, depth=0.5,
                        character=0.0, warm_seconds=0.0, interpret=False,
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
    # steady gating must be uniform across devices (it is a static trace
    # constant): use the global maximum over all shards' params.
    steady = tuple(int(max(x)) for x in
                   zip(*(vb.steady_limits(p) for p in params_all)))
    t_warm = -(-int(warm_seconds * sr) // t_tile) * t_tile \
        if warm_seconds > 0.0 else 0

    def per_device(params_d, ctrl_d, state_d):
        # (1, rows, 8, lanes), (S_loc, C), (S_loc, R) → local render
        state_l = state_d.T
        if t_warm:
            silence = jnp.zeros((t_warm, s_local), jnp.float32)
            _, state_l = mc.render_tpu(sr, ctrl_d.T, state_l, silence,
                                       interpret=interpret, t_tile=t_tile)
        voices = vb.render_voice_bank(params_d[0], t_pad, events=False,
                                      interpret=interpret, steady=steady)
        audio = voices[:, :s_local * v].reshape(t_pad, s_local, v).sum(-1)
        out, st = mc.render_tpu(sr, ctrl_d.T, state_l, audio,
                                interpret=interpret, t_tile=t_tile)
        return out.T  # (S_loc, T) so the batch axis stays leading

    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis)),
                   out_specs=P(axis), check_rep=False)
    out = fn(params_sh, ctrl_sh, state_sh)
    return jnp.swapaxes(out, 0, 1)[:t_total]
