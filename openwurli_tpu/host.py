"""Plugin-shell equivalent — the host-facing parameter surface + processor.

The reference wraps WurliEngine in a nih-plug CLAP/VST3 shell
(crates/openwurli-plugin) whose public surface is 6 parameters and a
block-based process() with sample-accurate MIDI sub-block splitting. This
module is the TPU build's host adapter: the same parameter surface
(params.rs:48-93), the same block semantics (plugin lib.rs:108-163 — param
sync per block, event-split rendering, CC64 sustain, mono→stereo fan-out),
consumable from any Python host (offline renderers, a JACK/pipewire bridge,
test harnesses).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Sequence

import numpy as np

from openwurli_tpu.engine import Engine


@dataclasses.dataclass
class WurliParams:
    """The 6 host parameters (reference params.rs, defaults preserved)."""

    volume: float = 0.5              # linear post-amp gain
    tremolo_depth: float = 0.5       # vibrato pot position
    speaker_character: float = 0.0   # 0 = bypass, 1 = authentic cabinet
    mlp_corrections: bool = True     # per-note MLP corrections
    authentic_noise: bool = False    # circuit thermal noise (melange preamp)
    noise_level: float = 1.0         # noise gain multiplier, up to 30x


@dataclasses.dataclass
class MidiEvent:
    """sample_offset is relative to the current block start."""

    sample_offset: int
    kind: str  # "note_on" | "note_off" | "cc"
    note: int = 0
    velocity: float = 0.0
    cc: int = 0
    value: int = 0


class WurliPlugin:
    """Block-based processor with the reference plugin's semantics."""

    CLAP_ID = "com.openwurli-tpu.wurlitzer-200a"

    def __init__(self, sample_rate: float = 44100.0,
                 preamp_model: str = "dk"):
        self.engine = Engine(sample_rate, preamp_model=preamp_model)
        self.params = WurliParams()

    def set_sample_rate(self, sr: float):
        self.engine.set_sample_rate(sr)

    def reset(self):
        self.engine.reset()

    def _sync_params(self):
        """Per-block param sync (plugin lib.rs:36-47); the engine smooths
        the audio-rate ones internally."""
        e = self.engine
        e.set_volume(self.params.volume)
        e.set_tremolo_depth(self.params.tremolo_depth)
        e.set_speaker_character(self.params.speaker_character)
        e.set_mlp_enabled(self.params.mlp_corrections)
        e.set_noise_enabled(self.params.authentic_noise)
        e.set_noise_gain(self.params.noise_level)

    def _dispatch(self, ev: MidiEvent):
        if ev.kind == "note_on":
            if ev.velocity > 0:
                self.engine.note_on(ev.note, ev.velocity)
            else:
                self.engine.note_off(ev.note)
        elif ev.kind == "note_off":
            self.engine.note_off(ev.note)
        elif ev.kind == "cc" and ev.cc == 64:
            self.engine.set_sustain(ev.value >= 64)

    def process(self, num_samples: int,
                events: Sequence[MidiEvent] = ()) -> np.ndarray:
        """Render one block with sample-accurate event splitting.

        Returns (num_samples, 2) float32 — mono engine fanned out to
        stereo, as the reference plugin does (lib.rs:158-163).
        """
        self._sync_params()
        events = sorted(events, key=lambda ev: ev.sample_offset)
        chunks = []
        cursor = 0
        for ev in events:
            off = min(max(int(ev.sample_offset), cursor), num_samples)
            if off > cursor:
                chunks.append(np.asarray(self.engine.render(off - cursor)))
                cursor = off
            self._dispatch(ev)
        if cursor < num_samples:
            chunks.append(np.asarray(self.engine.render(num_samples - cursor)))
        mono = (np.concatenate(chunks) if chunks
                else np.zeros(0, dtype=np.float32))
        return np.repeat(mono[:, None], 2, axis=1)


class FastWurliPlugin:
    """WurliPlugin-surface adapter over the fused-kernel FastEngine.

    Same parameter surface and process() contract as WurliPlugin, but
    backed by openwurli_tpu.fast_engine (one-time kernel compile, then
    ~100 ms/block dispatch over a tunneled device) instead of the f64
    scan engine (~6 min compile). Trade-offs inherited from FastEngine:
    controls are static per block (no 5 ms smoothing), and the FIRST
    enable of authentic_noise recompiles the block program (minutes
    over the tunnel; noise_level changes after that are live — see
    kernels/mono_chain.py preamp_step for the in-kernel Johnson-Nyquist
    model). Event placement is sample-accurate up to
    the kernel's 16-sample jitter grid (events forward their block
    offsets into FastEngine; reference sub-block splitting is plugin
    lib.rs:128-153) as long as process() block sizes keep the engine's
    internal 1024-sample blocks aligned — with an odd-sized surplus
    buffered, an event inside the already-rendered surplus slips to the
    next internal boundary (≤ 23 ms, the old behavior for all events).
    """

    CLAP_ID = WurliPlugin.CLAP_ID

    def __init__(self, sample_rate: float = 44100.0, **engine_kw):
        from openwurli_tpu.fast_engine import FastEngine

        self._engine_kw = dict(engine_kw)
        self.engine = FastEngine(sample_rate, **engine_kw)
        self.params = WurliParams()
        self._pos = 0  # stream samples handed out via process()

    def set_sample_rate(self, sr: float):
        from openwurli_tpu.fast_engine import FastEngine

        self.engine = FastEngine(sr, **self._engine_kw)
        self._pos = 0

    def reset(self):
        self.engine.reset()
        self._pos = 0

    def precompile(self):
        self.engine.precompile()

    def _sync_params(self):
        e = self.engine
        e.set_volume(self.params.volume)
        e.set_tremolo_depth(self.params.tremolo_depth)
        e.set_speaker_character(self.params.speaker_character)
        # Thermal noise (params.rs "Authentic Noise"/"Noise Level"):
        # first enable on a noise=False engine recompiles the block
        # program (minutes over the tunnel) — see FastEngine.set_noise_*.
        e.set_noise_enabled(self.params.authentic_noise)
        e.set_noise_gain(self.params.noise_level)

    def _dispatch(self, ev: MidiEvent, offset: int = 0):
        if ev.kind == "note_on":
            if ev.velocity > 0:
                self.engine.note_on(ev.note, ev.velocity, offset=offset)
            else:
                self.engine.note_off(ev.note, offset=offset)
        elif ev.kind == "note_off":
            self.engine.note_off(ev.note, offset=offset)
        elif ev.kind == "cc" and ev.cc == 64:
            self.engine.set_sustain(ev.value >= 64, offset=offset)

    def process(self, num_samples: int,
                events: Sequence[MidiEvent] = ()) -> np.ndarray:
        """Render one block → (num_samples, 2) float32 (stereo fan-out).

        Each event is dispatched BEFORE the audio containing it renders,
        carrying its in-block sample offset into FastEngine — placement
        is exact up to the kernel's 16-sample jitter grid whenever the
        event's engine-internal block has not rendered yet (see the
        class docstring for the surplus caveat)."""
        self._sync_params()
        n = int(num_samples)
        pos = self._pos
        blk = self.engine.block
        chunks = []
        cursor = 0
        for ev in sorted(events, key=lambda e: e.sample_offset):
            off = min(max(int(ev.sample_offset), 0), max(n - 1, 0))
            q = pos + off  # absolute stream sample of the event
            # Emit audio up to the engine-block boundary containing the
            # event (never past the event itself) so the event's offset
            # addresses the engine's next un-rendered block.
            off_b = max(cursor, min(off, q // blk * blk - pos))
            if off_b > cursor:
                chunks.append(self.engine.render(off_b - cursor))
                cursor = off_b
            self._dispatch(ev, max(0, q - self.engine._horizon))
        if cursor < n:
            chunks.append(self.engine.render(n - cursor))
        self._pos = pos + n
        mono = (np.concatenate(chunks) if chunks
                else np.zeros(0, dtype=np.float32))
        return np.repeat(mono[:, None], 2, axis=1)
