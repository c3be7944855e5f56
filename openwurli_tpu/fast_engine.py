"""FastEngine — interactive engine on the fused Pallas kernels.

The f64 `engine.Engine` is the accuracy reference but its scan chain
takes ~6 min to compile on the tunneled device, so "play a note on the
TPU interactively" had no practical route. FastEngine is the online
(incremental) form of fast.render_events: the same event-capable voice
kernel + mono-chain kernel, but driven by a live note_on/note_off/
set_sustain API with state carried block to block. Both of its kernels
compile with SHAPE-STABLE keys (fixed 128-lane bank, fixed internal
block, steady/min_release pinned), so the whole engine compiles once —
first-note latency is one voice-kernel + one chain-kernel compile
(~20-40 s on the tunnel), not a per-event recompile.

Semantics vs engine.Engine (same trade-offs as fast.render_events, the
batch form — parity gates in tests/test_fast_events.py):
  * events land at `offset` samples into the NEXT un-rendered block
    (default 0 = block start), then quantize to the 16-sample jitter
    grid inside the kernel (≈ 0.36 ms at 44.1 kHz). A host that knows
    its events' sample positions within the upcoming block (the
    reference plugin splits sub-blocks sample-accurately, plugin
    lib.rs:128-153) passes them as offsets and gets ≤ 8-sample
    placement error; immediate-mode callers that omit the offset get
    block-boundary placement (BLOCK samples ≈ 23 ms at 44.1 kHz);
  * controls (volume/tremolo depth/speaker character) are static per
    block — no 5 ms per-sample smoothing ramps;
  * voices are append-per-note-instance over a 128-lane bank with
    oldest-retired-lane reuse instead of 64-slot stealing+crossfade;
  * the chain runs in f32 deviation form (−40 dB full-chain relative /
    −53 dB at fixed tremolo trajectory, tests/test_mono_chain.py).

Bit-exactness: with the same schedule (events on block boundaries) a
FastEngine session produces IDENTICAL audio to fast.render_events —
gated in tests/test_fast_engine.py. This holds because pre-onset lanes
are frozen at note-on state in the kernel, so re-initialising a lane at
its (later) note-on equals having scheduled it from t=0.

Reference surface: WurliEngine engine.rs:154-675 (note_on/note_off/
set_sustain/setters/render/reset/warm_up).
"""

from __future__ import annotations

import numpy as np

from openwurli_tpu.kernels import mono_chain as mc
from openwurli_tpu.kernels import voice_bank as vb

LANES = 128
BLOCK = 1024          # internal render block (multiple of mc tile + 16)
WARM_UP_S = 0.6


class FastEngine:
    """Interactive fused-kernel engine. All device work happens in
    `render`; MIDI/control calls are host-side bookkeeping only."""

    def __init__(self, sample_rate: float = 44100.0, volume: float = 0.5,
                 tremolo_depth: float = 0.5, speaker_character: float = 0.0,
                 interpret: bool = False, t_tile: int | None = None,
                 lookahead: int = 0, noise: bool = False,
                 noise_level: float = 1.0):
        import jax

        self.sample_rate = float(sample_rate)
        self.interpret = bool(interpret)
        # Thermal noise (reference "Authentic Noise"/"Noise Level"
        # params): `noise` is a COMPILE-TIME variant selector (flipping
        # it later recompiles the block program — minutes over the
        # tunnel; measured 8 min for the full-song-shape program);
        # noise_level is a live runtime gain (set_noise_gain).
        self._noise = bool(noise)
        self._noise_on = bool(noise)
        self._noise_level = float(noise_level)
        # Pipelined dispatch depth: with lookahead=k, up to k future
        # blocks are dispatched (device-side, async) before the current
        # block's host transfer blocks — device compute and tunnel
        # round-trips overlap instead of serializing. Cost: events land
        # k blocks later (they cannot affect already-dispatched audio).
        self.lookahead = int(lookahead)
        self.t_tile = int(t_tile or mc.T_TILE)
        assert BLOCK % self.t_tile == 0 or self.t_tile % BLOCK == 0
        self.block = max(BLOCK, self.t_tile)
        self._volume = float(volume)
        self._depth = float(tremolo_depth)
        self._char = float(speaker_character)
        self._ctrl_dirty = True
        self._ctrl = None

        # host-side schedule (instance-per-note-on, lane-reusing).
        # FIXED-length arrays + a used-lane count: the packing math and
        # both kernels then keep one compiled shape for the whole
        # session (a growing schedule recompiled the eager packing ops
        # on every note count — ~30 s per note-on over the tunnel).
        self._midis = np.full(LANES, 60.0)
        self._vels = np.zeros(LANES)
        self._onsets = np.zeros(LANES)
        self._releases = np.full(LANES, np.inf)
        self._n_used = 0
        self._ringing: dict[int, int] = {}   # note → lane
        self._pending: set[int] = set()      # lanes held by the pedal
        self._sustain = False
        self._params_dirty = True
        self._params = None                  # device params (or None)
        self._new_lanes: list[int] = []      # lanes needing state re-init

        self._horizon = 0                    # samples rendered internally
        self._surplus = np.zeros(0, dtype=np.float32)
        self._inflight: list = []            # dispatched, unmaterialized

        with jax.default_device(mc._cpu_device()):
            mc.pack_consts(self.sample_rate)
            self._chain_state = jax.numpy.asarray(
                mc.init_state(self.sample_rate, 1))
        self._vstate = None
        self._block_fn = self._make_block_fn()

    def _make_block_fn(self):
        """ONE jitted program for a whole block (voice kernel → lane sum
        → chain kernel): the eager form paid several ~27 ms tunnel
        dispatches per block. n0 is traced, so every block of a session
        reuses the same compile."""
        import jax

        t = self.block

        @jax.jit
        def _block(params, ctrl, vstate, chain_state, n0):
            voices, vstate = vb.render_voice_bank(
                params, t, interpret=self.interpret, steady=None,
                state=vstate, n0=n0, return_state=True, events=True,
                min_release=0.0)
            # barriers keep the interpret-mode program's stage HLO
            # identical to fast.render_events' (bit-exactness gate);
            # no-ops on the real TPU — see fast.render_events._block
            voices, vstate = jax.lax.optimization_barrier(
                (voices, vstate))
            audio = voices.sum(-1, keepdims=True)
            audio = jax.lax.optimization_barrier(audio)
            out, chain_state = mc.render_tpu(
                self.sample_rate, ctrl, chain_state, audio,
                interpret=self.interpret, t_tile=self.t_tile,
                noise=self._noise)
            return out[:, 0], vstate, chain_state

        return _block

    # ── MIDI / parameter surface (engine.rs:154-675) ─────────────────

    def note_on(self, note: int, velocity: float, offset: int = 0):
        """velocity in [0, 1] (hosts pass midi_vel/127). offset: samples
        into the next un-rendered block (sample-accurate placement up to
        the kernel's 16-sample jitter grid)."""
        t = float(self._horizon + self._clip_offset(offset))
        old = self._ringing.get(int(note))
        if old is not None and not np.isfinite(self._releases[old]):
            self._releases[old] = t          # damp the re-struck voice
            self._pending.discard(old)
        lane = self._alloc_lane()
        self._midis[lane] = float(note)
        self._vels[lane] = float(velocity)
        self._onsets[lane] = t
        self._releases[lane] = np.inf
        self._ringing[int(note)] = lane
        self._new_lanes.append(lane)
        self._params_dirty = True

    def note_off(self, note: int, offset: int = 0):
        lane = self._ringing.get(int(note))
        if lane is None or np.isfinite(self._releases[lane]):
            return
        if self._sustain:
            self._pending.add(lane)
        else:
            self._releases[lane] = float(self._horizon
                                         + self._clip_offset(offset))
            self._params_dirty = True

    def set_sustain(self, held: bool, offset: int = 0):
        held = bool(held)
        if self._sustain and not held:
            t = float(self._horizon + self._clip_offset(offset))
            for lane in self._pending:
                self._releases[lane] = t
            self._pending.clear()
            self._params_dirty = True
        self._sustain = held

    def _clip_offset(self, offset) -> int:
        # Offsets address the next un-rendered block only: the block
        # renders as soon as render() needs it, so anything farther out
        # would need the host to re-send it (and a negative offset would
        # rewrite already-rendered audio).
        return max(0, min(int(offset), self.block - 1))

    # Setters mark controls dirty only on CHANGE: hosts re-sync every
    # block (host.py _sync_params), and an unconditional mark rebuilt +
    # re-uploaded the control rows per block.

    def set_volume(self, v: float):
        if float(v) != self._volume:
            self._volume = float(v)
            self._ctrl_dirty = True

    def set_tremolo_depth(self, d: float):
        if float(d) != self._depth:
            self._depth = float(d)
            self._ctrl_dirty = True

    def set_speaker_character(self, c: float):
        if float(c) != self._char:
            self._char = float(c)
            self._ctrl_dirty = True

    def set_noise_gain(self, g: float):
        """Runtime thermal-noise gain (no recompile; silent unless the
        engine was built — or later enabled — with noise=True)."""
        if float(g) != self._noise_level:
            self._noise_level = float(g)
            self._ctrl_dirty = True

    def set_noise_enabled(self, enabled: bool):
        """Enable/disable the thermal-noise chain variant. Enabling on
        an engine built with noise=False swaps in the noise program —
        a fresh multi-minute compile on the next rendered block;
        disabling just zeroes the runtime gain (no recompile)."""
        enabled = bool(enabled)
        if enabled and not self._noise:
            self._noise = True
            self._block_fn = self._make_block_fn()
            # In-flight blocks were dispatched under the old program but
            # their horizon/state already advanced — materialize them
            # into the surplus (dropping them would skip real audio).
            if self._inflight:
                self._surplus = np.concatenate(
                    [self._surplus]
                    + [np.asarray(b) for b in self._inflight])
                self._inflight = []
        if enabled != self._noise_on:
            self._noise_on = enabled
            self._ctrl_dirty = True

    def active_voice_count(self):
        if self._n_used == 0:
            return 0
        rel = self._releases[:self._n_used]
        ring = ~np.isfinite(rel)
        # released voices count until their damper tail has rendered
        tail = np.isfinite(rel) & (rel + 2.0 * self.sample_rate
                                   > self._horizon)
        return int((ring | tail).sum())

    def is_sustain_held(self):
        return self._sustain

    # ── rendering ─────────────────────────────────────────────────────

    def warm_up(self):
        """Settle the chain on silence (engine.rs warm_up, 0.6 s)."""
        import jax.numpy as jnp

        t_warm = -(-int(WARM_UP_S * self.sample_rate)
                   // self.t_tile) * self.t_tile
        silence = jnp.zeros((t_warm, 1), jnp.float32)
        _, self._chain_state = mc.render_tpu(
            self.sample_rate, self._controls(), self._chain_state,
            silence, interpret=self.interpret, t_tile=self.t_tile,
            noise=self._noise)

    def precompile(self):
        """Compile the fused block program and the warm-up shape
        CONCURRENTLY, then settle the chain.

        The block program (voice kernel + lane sum + chain kernel under
        ONE jit) and the warm-up-length chain program compile on the
        remote helper independently (~30-40 s each over the tunnel);
        overlapping them makes startup ≈ max, not sum, of the two — the
        first-note-latency budget. The throwaway block call uses its own
        params/state copies and never touches session state."""
        from concurrent.futures import ThreadPoolExecutor

        import jax
        import jax.numpy as jnp

        def compile_block():
            with jax.default_device(mc._cpu_device()):
                params, _ = vb.make_kernel_params(
                    self._midis, self._vels, self.sample_rate,
                    onsets=self._onsets, releases=self._releases,
                    lanes=LANES, n_active=0)
                params = np.asarray(params)
                ctrl = self._controls()
                chain0 = jnp.asarray(mc.init_state(self.sample_rate, 1))
            out, _, _ = self._block_fn(
                jnp.asarray(params),
                ctrl, jnp.asarray(vb.init_bank_state(params)), chain0,
                jnp.asarray(0, jnp.int32))
            jax.block_until_ready(out)

        def compile_warm():
            self.warm_up()

        with ThreadPoolExecutor(max_workers=2) as ex:
            fb = ex.submit(compile_block)
            fw = ex.submit(compile_warm)
            fb.result()
            fw.result()

    def render(self, num_samples: int) -> np.ndarray:
        """Render the next num_samples mono f32 samples."""
        out = []
        n = int(num_samples)
        while n > 0:
            if self._surplus.size:
                take = min(n, self._surplus.size)
                out.append(self._surplus[:take])
                self._surplus = self._surplus[take:]
                n -= take
                continue
            # Keep `lookahead` extra blocks in flight BEFORE blocking on
            # the oldest one's transfer: the device renders block N+1
            # while block N crosses the tunnel.
            while len(self._inflight) < 1 + self.lookahead:
                self._inflight.append(self._dispatch_block())
            self._surplus = np.asarray(self._inflight.pop(0))
        return (np.concatenate(out) if out
                else np.zeros(0, dtype=np.float32))

    def reset(self):
        import jax

        self._midis = np.full(LANES, 60.0)
        self._vels = np.zeros(LANES)
        self._onsets = np.zeros(LANES)
        self._releases = np.full(LANES, np.inf)
        self._n_used = 0
        self._ringing.clear()
        self._pending.clear()
        self._params = None
        self._params_dirty = True
        self._new_lanes = []
        self._vstate = None
        self._horizon = 0
        self._surplus = np.zeros(0, dtype=np.float32)
        self._inflight = []
        with jax.default_device(mc._cpu_device()):
            self._chain_state = jax.numpy.asarray(
                mc.init_state(self.sample_rate, 1))
        self.warm_up()

    # ── internals ─────────────────────────────────────────────────────
    # Events land at the first un-rendered sample (self._horizon):
    # surplus audio already handed to render() was rendered before the
    # event arrived, so the event quantizes to the next block boundary.

    def _alloc_lane(self) -> int:
        if self._n_used < LANES:
            self._n_used += 1
            return self._n_used - 1
        # lane reuse: retire the lane whose voice ended longest ago
        # (release + 2 s damper tail, or natural silence for old onsets)
        rel = np.where(np.isfinite(self._releases), self._releases,
                       self._onsets + 30.0 * self.sample_rate)
        lane = int(np.argmin(rel))
        note = int(self._midis[lane])
        if self._ringing.get(note) == lane:
            del self._ringing[note]
        self._pending.discard(lane)
        return lane

    def _controls(self):
        import jax
        import jax.numpy as jnp

        if self._ctrl_dirty or self._ctrl is None:
            with jax.default_device(mc._cpu_device()):
                self._ctrl = jnp.asarray(mc.make_controls(
                    self.sample_rate, 1, volume=self._volume,
                    depth=self._depth, character=self._char,
                    noise_level=(self._noise_level if self._noise_on
                                 else 0.0)))
            self._ctrl_dirty = False
        return self._ctrl

    def _repack(self):
        import jax
        import jax.numpy as jnp

        with jax.default_device(mc._cpu_device()):
            params, _ = vb.make_kernel_params(
                self._midis, self._vels, self.sample_rate,
                onsets=self._onsets, releases=self._releases,
                lanes=LANES, n_active=self._n_used)
        params_np = np.asarray(params)
        fresh = vb.init_bank_state(params_np)
        if self._vstate is None:
            vstate = fresh
        else:
            vstate = np.array(self._vstate)  # host copy (asarray view
            # of a jax buffer is read-only)
            for lane in self._new_lanes:
                # a lane re-initialised at its (future) onset is
                # bit-identical to one scheduled from t=0: the kernel
                # freezes pre-onset lanes at note-on state.
                vstate[:, lane] = fresh[:, lane]
        self._new_lanes = []
        self._params = jnp.asarray(params_np)
        self._vstate = jnp.asarray(vstate)
        self._params_dirty = False

    def _dispatch_block(self):
        """Dispatch one block's fused program; returns the DEVICE output
        array (async — the host does not block here). steady=None and
        min_release=0.0 keep the kernel's compile key fixed across note
        events; the always-on onset/noise/damper arithmetic they skip
        is noise at 128 lanes. Silent sessions run the same program on
        the all-silent param pack (zero-amplitude voices emit exact
        0.0), so the whole engine is ONE compiled program."""
        import jax.numpy as jnp

        if self._params_dirty or self._params is None:
            self._repack()
        out, self._vstate, self._chain_state = self._block_fn(
            self._params, self._controls(), self._vstate,
            self._chain_state, jnp.asarray(self._horizon, jnp.int32))
        self._horizon += self.block
        return out
