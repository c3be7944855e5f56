"""Single-voice synthesis: reed + hammer noise + pickup + voicing gain.

Signal flow per sample: modal reed (+attack noise) → time-varying-RC pickup
→ post-pickup voicing gain. Behaviour-parity rebuild of
crates/openwurli-dsp/src/voice.rs, restructured TPU-first:

  * ``note_on_params`` computes EVERY note-on quantity (tables, variation,
    dwell, velocity curve, MLP corrections, gains) fully batched — a whole
    64-key × 8-velocity calibration grid is one call.
  * ``step`` advances all batched voices one sample (pure scan body).
  * ``render`` runs the scan; voices are a batch axis, never objects.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from openwurli_tpu import hammer, mlp, pickup, reed, tables, variation
from openwurli_tpu.tables import NUM_MODES

SILENCE_THRESHOLD_DB = -80.0
RELEASE_TIMEOUT_S = 10.0


class VoiceParams(NamedTuple):
    reed: reed.ReedParams
    noise: hammer.NoiseParams
    pickup: pickup.PickupParams
    post_pickup_gain: jnp.ndarray  # (...,)
    midi_note: jnp.ndarray  # (...,) float (for damper register law)


class VoiceState(NamedTuple):
    reed: reed.ReedState
    noise: hammer.NoiseState
    pickup: pickup.PickupState


def note_on_params(midi_note, velocity, sample_rate, mlp_enabled=True,
                   cfg: tables.CalibrationConfig = tables.CalibrationConfig(),
                   weights=None, displacement_scale=None) -> VoiceParams:
    """All note-on parameter computation, batched over leading dims.

    Mirrors voice.rs:28-142: tables → variation → dwell/onset → velocity
    s-curve^exponent → MLP corrections (freq cents on modes 1-5, decay
    ratios, ds multiplier) → pickup + output scale + MLP level compensation.
    """
    m = jnp.asarray(midi_note, dtype=jnp.float64)
    v = jnp.asarray(velocity, dtype=jnp.float64)
    m, v = jnp.broadcast_arrays(m, v)

    params = tables.note_params(m)
    detuned = params["fundamental_hz"] * variation.freq_detune(m)

    dwell = hammer.dwell_attenuation(v, detuned, params["mode_ratios"])
    onset_time = hammer.onset_ramp_time(v, detuned)
    amp_offsets = variation.mode_amplitude_offsets(m)

    amplitudes = params["mode_amplitudes"] * dwell * amp_offsets
    vel_scale = tables.velocity_scurve(v) ** tables.velocity_exponent(m)
    amplitudes = amplitudes * vel_scale[..., None]

    corr = mlp.infer(m, v, weights=weights, enabled=mlp_enabled)

    # Frequency corrections on modes 1-5 (fundamental never corrected)
    ratios = params["mode_ratios"]
    ratios = ratios.at[..., 1:6].multiply(
        2.0 ** (corr.freq_offsets_cents / 1200.0))

    decays = params["mode_decay_rates"]
    decays = decays.at[..., 1:6].divide(corr.decay_offsets)

    base_ds = tables.pickup_displacement_scale(m, cfg)
    corrected_ds = base_ds * corr.ds_correction
    if displacement_scale is not None:
        corrected_ds = jnp.broadcast_to(
            jnp.asarray(displacement_scale, dtype=jnp.float64), m.shape)

    reed_params = reed.make_params(
        detuned, ratios, amplitudes, decays, onset_time, v, sample_rate)

    # MLP level compensation: ds changes pickup drive and thus level; the
    # sqrt of the RMS-proxy ratio restores level so MLP adjusts timbre only
    # (voice.rs:110-132; sqrt matches the RC model's measured smoothing).
    base_output_scale = tables.output_scale(m, v, cfg)
    f0 = tables.midi_to_freq(m)
    proxy_base = tables.pickup_rms_proxy(base_ds, f0)
    proxy_corr = tables.pickup_rms_proxy(corrected_ds, f0)
    comp = jnp.where(
        (jnp.abs(corr.ds_correction - 1.0) > 1e-6) & (proxy_corr > 1e-10),
        jnp.sqrt(proxy_base / jnp.maximum(proxy_corr, 1e-300)),
        1.0,
    )
    post_pickup_gain = base_output_scale * comp

    noise_params, _ = hammer.make_noise(v, detuned, sample_rate, 0)
    return VoiceParams(
        reed=reed_params,
        noise=noise_params,
        pickup=pickup.make_params(sample_rate, corrected_ds),
        post_pickup_gain=post_pickup_gain,
        midi_note=m,
    ), detuned


def init_state(vparams: VoiceParams, detuned_hz, velocity, sample_rate,
               noise_seed) -> VoiceState:
    """Per-voice state at note-on. noise_seed seeds both the reed jitter
    Box-Muller stream and the attack-noise LCG (as in the reference)."""
    v = jnp.asarray(velocity, dtype=jnp.float64)
    _, noise_state = hammer.make_noise(v, detuned_hz, sample_rate, noise_seed)
    return VoiceState(
        reed=reed.init_state(vparams.reed, noise_seed),
        noise=noise_state,
        pickup=pickup.init_state(vparams.midi_note.shape),
    )


def note_off(vparams: VoiceParams, state: VoiceState, sample_rate,
             active=True) -> VoiceState:
    """Start the progressive damper (masked for batched note-offs)."""
    return state._replace(
        reed=reed.start_damper(state.reed, vparams.midi_note, sample_rate,
                               active))


def step(vparams: VoiceParams, state: VoiceState):
    """One sample of the full voice chain. Returns (state, output)."""
    reed_state, reed_out = reed.step(vparams.reed, state.reed)
    noise_state, noise_out = hammer.noise_step(vparams.noise, state.noise)
    pickup_state, out = pickup.step(vparams.pickup, state.pickup,
                                    reed_out + noise_out)
    return (VoiceState(reed_state, noise_state, pickup_state),
            out * vparams.post_pickup_gain)


def render(vparams: VoiceParams, state: VoiceState, num_samples: int):
    """Render num_samples; output (num_samples, ...batch)."""

    def body(st, _):
        return step(vparams, st)

    return jax.lax.scan(body, state, None, length=num_samples)


def is_silent(vparams: VoiceParams, state: VoiceState, sample_rate):
    """Silence check incl. 10 s release safety timeout (voice.rs:183-188)."""
    timed_out = (state.reed.damper_active
                 & (reed.release_seconds(state.reed, sample_rate)
                    > RELEASE_TIMEOUT_S))
    return timed_out | reed.is_silent(vparams.reed, state.reed,
                                      SILENCE_THRESHOLD_DB)


def default_note_seed(midi_note):
    """The reference's offline-render seed: midi * 2654435761 (wrapping)."""
    return (jnp.asarray(midi_note).astype(jnp.uint32)
            * jnp.uint32(2654435761))


def render_note(midi_note, velocity, duration_secs, sample_rate,
                displacement_scale=None, mlp_enabled=False):
    """Offline single/batched note render (voice.rs:191-221 parity).

    midi_note/velocity may be arrays — the whole grid renders in one scan.
    Returns (num_samples, ...batch) float64.
    """
    vparams, detuned = note_on_params(
        midi_note, velocity, sample_rate, mlp_enabled=mlp_enabled,
        displacement_scale=displacement_scale)
    state = init_state(vparams, detuned, velocity, sample_rate,
                       default_note_seed(midi_note))
    n = int(duration_secs * sample_rate)
    _, out = render(vparams, state, n)
    return out
