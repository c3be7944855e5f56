"""WurliEngine — polyphonic synth engine with the full analog chain.

Behaviour-parity rebuild of crates/openwurli-dsp/src/engine.rs, designed
TPU-first: the 64 voice slots are a *batch axis* of struct-of-array state
(VoiceParams/VoiceState with leading dim 64), note_on/note_off/stealing are
masked updates, and `render` is one lax.scan whose body advances all voices
as vector ops and threads the mono chain (2× oversampled tremolo → DK
preamp → fixed circuit drive → power amp → downsample → speaker → post
gain) per sample.

Voice stealing: a parallel bank of 64 "steal" voices renders the stolen
voice under a 5 ms linear fade (engine.rs:316-322, 481-493).

Public surface mirrors the reference engine: note_on / note_off /
set_sustain / set_volume / set_tremolo_depth / set_speaker_character /
set_mlp_enabled / set_rail_sag / render / reset / warm_up, plus the
nan_guard_fires diagnostic.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from openwurli_tpu import tables, voice
from openwurli_tpu.circuits import (dk_preamp, melange_preamp, power_amp,
                                    speaker, tremolo)
from openwurli_tpu.ops import allpass

MAX_VOICES = 64
STEAL_FADE_S = 0.005
SMOOTH_S = 0.005
WARM_UP_S = 0.6

# Slot states (engine.rs VoiceState)
FREE, HELD, SUSTAINED, RELEASING = 0, 1, 2, 3


class Smoother(NamedTuple):
    """5 ms linear parameter smoother (engine.rs LinearSmoother)."""

    current: jnp.ndarray
    target: jnp.ndarray
    step: jnp.ndarray
    remaining: jnp.ndarray  # int32


def smoother_init(value, ramp_samples):
    v = jnp.asarray(value, dtype=jnp.float64)
    return Smoother(v, v, jnp.zeros_like(v), jnp.zeros((), dtype=jnp.int32)), \
        ramp_samples


def smoother_set(s: Smoother, ramp_samples, target):
    target = jnp.asarray(target, dtype=jnp.float64)
    changed = jnp.abs(target - s.target) >= 1e-9
    step = (target - s.current) / ramp_samples
    return Smoother(
        current=s.current,
        target=jnp.where(changed, target, s.target),
        step=jnp.where(changed, step, s.step),
        remaining=jnp.where(changed, jnp.int32(ramp_samples), s.remaining),
    )


def smoother_next(s: Smoother):
    active = s.remaining > 0
    nxt = jnp.where(active, s.current + s.step, s.current)
    rem = jnp.where(active, s.remaining - 1, s.remaining)
    nxt = jnp.where(active & (rem == 0), s.target, nxt)
    return Smoother(nxt, s.target, s.step, rem), nxt


class EngineParams(NamedTuple):
    preamp: dk_preamp.PreampParams
    tremolo: tremolo.TremoloParams
    power_amp: power_amp.PowerAmpParams
    speaker: speaker.SpeakerParams


class EngineState(NamedTuple):
    # Voice banks (leading dim MAX_VOICES)
    vparams: voice.VoiceParams
    vstate: voice.VoiceState
    sparams: voice.VoiceParams  # steal bank params
    sstate: voice.VoiceState
    steal_fade: jnp.ndarray  # (V,) int32 remaining fade samples
    slot_state: jnp.ndarray  # (V,) int32
    midi_note: jnp.ndarray  # (V,) int32
    age: jnp.ndarray  # (V,) int64
    age_counter: jnp.ndarray  # () int64
    # Mono chain
    os: allpass.OversamplerState
    trem: tremolo.TremoloState
    pre: dk_preamp.PreampState
    pa: power_amp.PowerAmpState
    spk: speaker.SpeakerState
    # Params / smoothers
    volume: Smoother
    trem_depth: Smoother
    spk_char: Smoother
    sustain_held: jnp.ndarray  # () bool
    mlp_enabled: jnp.ndarray  # () bool
    rail_sag: jnp.ndarray  # () bool
    noise_enabled: jnp.ndarray  # () bool (melange preamp only)
    noise_gain: jnp.ndarray  # () f64
    nan_guard_fires: jnp.ndarray  # () int64


class Engine:
    """Host-facing wrapper holding static config + jitted kernels.

    All mutation flows through the functional state pytree; the class only
    caches params and compiled functions. `state` is exposed so offline
    tools can vmap/shard whole engines.
    """

    def __init__(self, sample_rate: float, preamp_model: str = "dk",
                 pa_model: str = "circuit"):
        """pa_model: "circuit" (melange-equivalent 8-BJT solver, the
        reference's default binary) or "behavioral" (the reference's
        legacy-power-amp closed-loop NR model, power_amp.rs:167-276 —
        the config its committed alias-audit baseline was captured
        with)."""
        assert preamp_model in ("dk", "melange"), preamp_model
        assert pa_model in ("circuit", "behavioral"), pa_model
        self.sample_rate = float(sample_rate)
        self.preamp_model = preamp_model
        self.pa_model = pa_model
        self.oversample = self.sample_rate < 88_200.0
        self.os_sample_rate = (self.sample_rate * 2.0 if self.oversample
                               else self.sample_rate)
        self.ramp_samples = max(int(self.sample_rate * SMOOTH_S), 1)
        preamp_params = (dk_preamp.make_params(self.os_sample_rate)
                         if preamp_model == "dk"
                         else melange_preamp.make_params(self.os_sample_rate))
        self.params = EngineParams(
            preamp=preamp_params,
            tremolo=tremolo.make_params(self.os_sample_rate),
            power_amp=power_amp.make_params(self.os_sample_rate),
            speaker=speaker.make_params(self.sample_rate),
        )
        self.state = self.initial_state()
        self._render = functools.partial(_render, self)
        self._note_on = functools.partial(_note_on_jit, self)
        self._note_off = functools.partial(_note_off_jit, self)

    # Engines with the same sample rate share identical (deterministically
    # built) params, so they hash equal — jitted kernels compile once per
    # rate, not once per instance.
    def __hash__(self):
        return hash(("openwurli_tpu.Engine", self.sample_rate,
                     self.preamp_model, self.pa_model))

    def __eq__(self, other):
        return (isinstance(other, Engine)
                and other.sample_rate == self.sample_rate
                and other.preamp_model == self.preamp_model
                and other.pa_model == self.pa_model)

    # ── state construction ───────────────────────────────────────────────

    def initial_state(self) -> EngineState:
        dummy_notes = jnp.full((MAX_VOICES,), 60.0, dtype=jnp.float64)
        zero_vel = jnp.zeros((MAX_VOICES,), dtype=jnp.float64)
        vparams, detuned = voice.note_on_params(
            dummy_notes, zero_vel, self.sample_rate, mlp_enabled=False)
        vstate = voice.init_state(vparams, detuned, zero_vel,
                                  self.sample_rate,
                                  jnp.zeros(MAX_VOICES, dtype=jnp.uint32))
        vol, _ = smoother_init(0.5, self.ramp_samples)
        dep, _ = smoother_init(0.5, self.ramp_samples)
        chr_, _ = smoother_init(0.0, self.ramp_samples)
        return EngineState(
            vparams=vparams, vstate=vstate,
            sparams=vparams, sstate=vstate,
            steal_fade=jnp.zeros(MAX_VOICES, dtype=jnp.int32),
            slot_state=jnp.zeros(MAX_VOICES, dtype=jnp.int32),
            midi_note=jnp.zeros(MAX_VOICES, dtype=jnp.int32),
            age=jnp.zeros(MAX_VOICES, dtype=jnp.int64),
            age_counter=jnp.zeros((), dtype=jnp.int64),
            os=allpass.init_state(),
            trem=tremolo.init_state(self.os_sample_rate),
            pre=(dk_preamp.init_state(self.params.preamp)
                 if self.preamp_model == "dk"
                 else melange_preamp.init_state(self.params.preamp)),
            pa=power_amp.init_state(self.params.power_amp),
            spk=speaker.init_state(),
            volume=vol, trem_depth=dep, spk_char=chr_,
            sustain_held=jnp.asarray(False),
            mlp_enabled=jnp.asarray(True),
            rail_sag=jnp.asarray(True),
            noise_enabled=jnp.asarray(False),
            noise_gain=jnp.asarray(1.0, dtype=jnp.float64),
            nan_guard_fires=jnp.zeros((), dtype=jnp.int64),
        )

    # ── MIDI / params (host API, mirrors WurliEngine) ────────────────────

    def note_on(self, note, velocity):
        self.state = self._note_on(self.state, jnp.asarray(note),
                                   jnp.asarray(float(velocity)))

    def note_off(self, note):
        self.state = self._note_off(self.state, jnp.asarray(note))

    def set_sustain(self, held: bool):
        self.state = _set_sustain(self, self.state, held)

    def set_volume(self, v):
        st = self.state
        self.state = st._replace(
            volume=smoother_set(st.volume, self.ramp_samples, v))

    def set_tremolo_depth(self, d):
        st = self.state
        self.state = st._replace(
            trem_depth=smoother_set(st.trem_depth, self.ramp_samples, d))

    def set_speaker_character(self, c):
        st = self.state
        self.state = st._replace(
            spk_char=smoother_set(st.spk_char, self.ramp_samples, c))

    def set_mlp_enabled(self, on: bool):
        self.state = self.state._replace(mlp_enabled=jnp.asarray(bool(on)))

    def set_rail_sag(self, on: bool):
        self.state = self.state._replace(rail_sag=jnp.asarray(bool(on)))

    def set_noise_enabled(self, on: bool):
        """Authentic circuit noise — active on the melange preamp only
        (the legacy 8-node solver has no noise model, as in the
        reference's default build)."""
        self.state = self.state._replace(noise_enabled=jnp.asarray(bool(on)))

    def set_noise_gain(self, gain: float):
        self.state = self.state._replace(
            noise_gain=jnp.asarray(float(gain), dtype=jnp.float64))

    BLOCK = 256
    # Geometric dispatch ladder: long renders issue ONE device dispatch
    # per 16k/2k chunk instead of one per 256 samples — on a tunneled
    # device at ~27 ms/dispatch round-trip the old fixed-256 loop cost
    # ~4.6 s of pure dispatch per rendered second. Each distinct chunk
    # length compiles once; scan compile time is length-independent.
    CHUNK_LADDER = (16384, 2048, 256)

    def render(self, num_samples: int):
        """Render num_samples mono float32 samples through the full chain.

        Device-resident multi-block rendering: the sample loop is a
        single lax.scan per chunk (CHUNK_LADDER sizes + one remainder),
        so host↔device round-trips are O(seconds), not O(blocks).
        """
        chunks = []
        n = int(num_samples)
        for size in self.CHUNK_LADDER:
            while n >= size:
                self.state, out = self._render(self.state, size)
                chunks.append(out)
                n -= size
        if n:
            self.state, out = self._render(self.state, n)
            chunks.append(out)
        if not chunks:
            return jnp.zeros(0, dtype=jnp.float32)
        return jnp.concatenate(chunks) if len(chunks) > 1 else chunks[0]

    def reset(self):
        st = self.initial_state()
        self.state = st._replace(
            volume=Smoother(self.state.volume.target,
                            self.state.volume.target,
                            jnp.zeros(()), jnp.zeros((), dtype=jnp.int32)),
            trem_depth=Smoother(self.state.trem_depth.target,
                                self.state.trem_depth.target,
                                jnp.zeros(()), jnp.zeros((), dtype=jnp.int32)),
            spk_char=Smoother(self.state.spk_char.target,
                              self.state.spk_char.target,
                              jnp.zeros(()), jnp.zeros((), dtype=jnp.int32)),
            mlp_enabled=self.state.mlp_enabled,
            rail_sag=self.state.rail_sag,
        )
        self.warm_up()

    def warm_up(self):
        """Settle preamp/shadow-pump/CdS to steady state (0.6 s silence)."""
        self.render(int(self.sample_rate * WARM_UP_S))

    # ── inspection helpers (engine.rs test API) ──────────────────────────

    def active_voice_count(self):
        return int((self.state.slot_state != FREE).sum())

    def held_voice_count(self):
        return int((self.state.slot_state == HELD).sum())

    def sustained_voice_count(self):
        return int((self.state.slot_state == SUSTAINED).sum())

    def count_voices_in_state(self, s):
        return int((self.state.slot_state == s).sum())

    def count_voices_with_note_in_state(self, note, s):
        return int(((self.state.slot_state == s)
                    & (self.state.midi_note == note)).sum())

    def has_steal_voice_for(self, note):
        return bool(((self.state.midi_note == note)
                     & (self.state.steal_fade > 0)).any())

    def is_sustain_held(self):
        return bool(self.state.sustain_held)

    def set_sample_rate(self, sr: float):
        """Rebuild the chain at a new rate (targets/flags preserved)."""
        keep = self.state
        self.__init__(sr)
        self.state = self.state._replace(
            volume=keep.volume, trem_depth=keep.trem_depth,
            spk_char=keep.spk_char, mlp_enabled=keep.mlp_enabled,
            rail_sag=keep.rail_sag)
        self.warm_up()

    def nan_guard_fires(self):
        return int(self.state.nan_guard_fires)

    def power_amp_diag(self):
        """Solver robustness counters (WurliEngine::power_amp_diag,
        engine.rs:418-420): all stay 0 on normal content."""
        import numpy as np

        d = self.state.pa.circuit.diag
        return {k: int(np.sum(np.asarray(v)))
                for k, v in d._asdict().items()}

    def tremolo_diag(self):
        import numpy as np

        d = self.state.trem.osc.diag
        return {k: int(np.sum(np.asarray(v)))
                for k, v in d._asdict().items()}


# ── functional core ──────────────────────────────────────────────────────


def _write_slot(bank, idx, new):
    """Write a scalar-voice pytree into slot idx of a banked pytree."""
    return jax.tree.map(lambda b, n: b.at[idx].set(n), bank, new)


@functools.partial(jax.jit, static_argnums=0)
def _note_on_jit(eng, st, note, velocity):
    return _note_on(eng, st, note, velocity)


@functools.partial(jax.jit, static_argnums=0)
def _note_off_jit(eng, st, note):
    return _note_off(eng, st, note)


def _note_on(eng: Engine, st: EngineState, note, velocity):
    note = jnp.clip(note, tables.MIDI_LO, tables.MIDI_HI).astype(jnp.int32)

    # Re-strike of a sustained note: damp the old vibration first.
    restrike = (st.slot_state == SUSTAINED) & (st.midi_note == note)
    vstate = voice.note_off(st.vparams, st.vstate, eng.sample_rate,
                            active=restrike)
    slot_state = jnp.where(restrike, RELEASING, st.slot_state)

    # Allocation priority: first Free (by index) > oldest Releasing >
    # oldest Sustained > oldest Held (engine.rs:569-590).
    idxs = jnp.arange(MAX_VOICES, dtype=jnp.int64)
    big = jnp.int64(1) << 40
    priority = jnp.where(
        slot_state == FREE, idxs,
        jnp.where(slot_state == RELEASING, big + st.age,
                  jnp.where(slot_state == SUSTAINED, 2 * big + st.age,
                            3 * big + st.age)))
    idx = jnp.argmin(priority)
    stealing = slot_state[idx] != FREE

    # Steal: move the active voice into the steal bank with a 5 ms fade.
    fade_samples = jnp.int32(eng.sample_rate * STEAL_FADE_S)
    sparams = jax.tree.map(
        lambda sb, vb: jnp.where(stealing, sb.at[idx].set(vb[idx]), sb),
        st.sparams, st.vparams)
    sstate = jax.tree.map(
        lambda sb, vb: jnp.where(stealing, sb.at[idx].set(vb[idx]), sb),
        st.sstate, vstate)
    steal_fade = jnp.where(
        stealing, st.steal_fade.at[idx].set(fade_samples), st.steal_fade)

    age_counter = st.age_counter + 1
    noise_seed = (note.astype(jnp.uint32) * jnp.uint32(2654435761)
                  + age_counter.astype(jnp.uint32))

    new_params, detuned = voice.note_on_params(
        note.astype(jnp.float64), velocity, eng.sample_rate,
        mlp_enabled=st.mlp_enabled)
    new_state = voice.init_state(new_params, detuned, velocity,
                                 eng.sample_rate, noise_seed)
    vparams = _write_slot(st.vparams, idx, new_params)
    vstate = _write_slot(vstate, idx, new_state)

    return st._replace(
        vparams=vparams, vstate=vstate, sparams=sparams, sstate=sstate,
        steal_fade=steal_fade,
        slot_state=slot_state.at[idx].set(HELD),
        midi_note=st.midi_note.at[idx].set(note),
        age=st.age.at[idx].set(age_counter),
        age_counter=age_counter,
    )


def _note_off(eng: Engine, st: EngineState, note):
    note = jnp.clip(note, tables.MIDI_LO, tables.MIDI_HI).astype(jnp.int32)
    held_match = (st.slot_state == HELD) & (st.midi_note == note)
    any_match = jnp.any(held_match)
    ages = jnp.where(held_match, st.age, jnp.int64(1) << 62)
    idx = jnp.argmin(ages)

    to_sustain = any_match & st.sustain_held
    to_release = any_match & ~st.sustain_held
    mask = jnp.zeros(MAX_VOICES, dtype=bool).at[idx].set(True)

    vstate = voice.note_off(st.vparams, st.vstate, eng.sample_rate,
                            active=mask & to_release)
    slot_state = jnp.where(
        mask & to_sustain, SUSTAINED,
        jnp.where(mask & to_release, RELEASING, st.slot_state))
    return st._replace(vstate=vstate, slot_state=slot_state)


def _set_sustain(eng: Engine, st: EngineState, held: bool):
    held_arr = jnp.asarray(bool(held))
    release = st.sustain_held & ~held_arr
    mask = (st.slot_state == SUSTAINED) & release
    vstate = voice.note_off(st.vparams, st.vstate, eng.sample_rate,
                            active=mask)
    slot_state = jnp.where(mask, RELEASING, st.slot_state)
    return st._replace(vstate=vstate, slot_state=slot_state,
                       sustain_held=held_arr)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _render(eng: Engine, st: EngineState, num_samples: int):
    params = eng.params
    fade_len = jnp.float64(max(int(eng.sample_rate * STEAL_FADE_S), 1))

    def body(carry, _):
        st = carry

        # ── all 64 main + 64 steal voices, one vector step ──
        vstate, v_out = voice.step(st.vparams, st.vstate)
        sstate, s_out = voice.step(st.sparams, st.sstate)

        active = st.slot_state != FREE
        v_out = jnp.where(active, v_out, 0.0)

        steal_active = st.steal_fade > 0
        gain = st.steal_fade.astype(jnp.float64) / fade_len
        s_out = jnp.where(steal_active, s_out * gain, 0.0)
        steal_fade = jnp.maximum(st.steal_fade - 1, 0)

        # NaN guard #1 (pre-oversampler): force-free voices producing
        # non-finite output so NaN can't poison the IIR chain.
        v_bad = ~jnp.isfinite(v_out)
        s_bad = ~jnp.isfinite(s_out)
        fires = jnp.any(v_bad | s_bad).astype(jnp.int64)
        v_out = jnp.where(v_bad, 0.0, v_out)
        s_out = jnp.where(s_bad, 0.0, s_out)
        slot_state = jnp.where(v_bad, FREE, st.slot_state)
        steal_fade = jnp.where(s_bad, 0, steal_fade)

        mono = jnp.sum(v_out) + jnp.sum(s_out)

        # ── smoothers (once per base sample) ──
        trem_depth_s, depth = smoother_next(st.trem_depth)
        volume_s, user_vol = smoother_next(st.volume)
        spk_char_s, char = smoother_next(st.spk_char)

        # ── 2× oversampled nonlinear chain ──
        if eng.oversample:
            os_state, (e, o) = allpass.up_step(st.os, mono)
            trem, pre, pa_st = st.trem, st.pre, st.pa
            ys = []
            for u in (e, o):
                trem, shunt = tremolo.step(params.tremolo, trem, depth)
                g_ldr = dk_preamp.ldr_conductance(shunt)
                if eng.preamp_model == "dk":
                    pre, pre_out = dk_preamp.step(params.preamp, pre,
                                                  g_ldr, u)
                else:
                    pre, pre_out = melange_preamp.step(
                        params.preamp, pre, g_ldr, u,
                        noise_enabled=st.noise_enabled,
                        noise_gain=st.noise_gain)
                if eng.pa_model == "circuit":
                    pa_st, y = power_amp.step(
                        params.power_amp, pa_st,
                        pre_out * tables.FIXED_CIRCUIT_DRIVE,
                        rail_sag=st.rail_sag)
                else:
                    y = power_amp.behavioral_process(
                        pre_out * tables.FIXED_CIRCUIT_DRIVE)
                ys.append(y)
            os_state, amp_out = allpass.down_step(os_state, ys[0], ys[1])
        else:
            os_state = st.os
            trem, shunt = tremolo.step(params.tremolo, st.trem, depth)
            g_ldr = dk_preamp.ldr_conductance(shunt)
            if eng.preamp_model == "dk":
                pre, pre_out = dk_preamp.step(params.preamp, st.pre,
                                              g_ldr, mono)
            else:
                pre, pre_out = melange_preamp.step(
                    params.preamp, st.pre, g_ldr, mono,
                    noise_enabled=st.noise_enabled,
                    noise_gain=st.noise_gain)
            if eng.pa_model == "circuit":
                pa_st, amp_out = power_amp.step(
                    params.power_amp, st.pa,
                    pre_out * tables.FIXED_CIRCUIT_DRIVE,
                    rail_sag=st.rail_sag)
            else:
                pa_st = st.pa
                amp_out = power_amp.behavioral_process(
                    pre_out * tables.FIXED_CIRCUIT_DRIVE)

        # ── speaker + post gain ──
        spk_coeffs = speaker.coeffs_for_character(char, params.speaker.sample_rate)
        spk, shaped = speaker.step(params.speaker, st.spk, spk_coeffs, amp_out)
        out = shaped * tables.POST_SPEAKER_GAIN * user_vol

        # NaN guard #2 (final output): reset chain, emit silence.
        bad = ~jnp.isfinite(out)
        pre_init = (dk_preamp.init_state(params.preamp)
                    if eng.preamp_model == "dk"
                    else melange_preamp.init_state(params.preamp))
        pre = jax.tree.map(
            lambda cur, ini: jnp.where(bad, jnp.broadcast_to(ini, cur.shape),
                                       cur), pre, pre_init)
        os_state = jax.tree.map(
            lambda cur, ini: jnp.where(bad, ini, cur), os_state,
            allpass.init_state())
        pa_st = jax.tree.map(
            lambda cur, ini: jnp.where(bad, ini, cur), pa_st,
            power_amp.init_state(params.power_amp))
        spk = jax.tree.map(
            lambda cur, ini: jnp.where(bad, ini, cur), spk,
            speaker.init_state())
        out = jnp.where(bad, 0.0, out)

        new_st = st._replace(
            vstate=vstate, sstate=sstate, steal_fade=steal_fade,
            slot_state=slot_state, os=os_state, trem=trem, pre=pre,
            pa=pa_st, spk=spk, volume=volume_s, trem_depth=trem_depth_s,
            spk_char=spk_char_s,
            nan_guard_fires=st.nan_guard_fires + fires,
        )
        return new_st, out.astype(jnp.float32)

    st, out = jax.lax.scan(body, st, None, length=num_samples)

    # Voice cleanup (once per block): silent voices → Free.
    silent = voice.is_silent(st.vparams, st.vstate, eng.sample_rate)
    active = st.slot_state != FREE
    st = st._replace(
        slot_state=jnp.where(active & silent, FREE, st.slot_state))
    return st, out
