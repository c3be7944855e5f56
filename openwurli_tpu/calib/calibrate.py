"""Gain-chain calibration sweep — 5 tap points over a note×velocity grid.

The TPU-native rebuild of `preamp-bench calibrate` (reference
tools/preamp-bench/src/main.rs:1069-1258): per (note, velocity) the chain is
measured at taps T1 (raw reed) → T2 (+pickup) → T3 (+output_scale) →
T4 (+2× oversampled DK preamp @ R_ldr=1 MΩ) → T5 (+vol² + power amp +
speaker + POST_SPEAKER_GAIN), reporting peak/RMS/H2-H1 per tap.

Where the reference loops notes × velocities serially, here the ENTIRE grid
renders as one batched scan — reed (G,7) vector ops, preamp (G,2,8)
matvecs, power amp (G,21) solves per sample. This is BASELINE.json
config 4: "all 64 keys × 8 velocities rendered in one vmapped pass".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from openwurli_tpu import hammer, pickup, reed, tables, variation
from openwurli_tpu.calib import goertzel
from openwurli_tpu.circuits import dk_preamp, power_amp, speaker
from openwurli_tpu.ops import allpass

BASE_SR = 44_100.0
DURATION_S = 0.5
MEASURE_START_S = 0.100
MEASURE_END_S = 0.400


def _window(buf):
    a = int(MEASURE_START_S * BASE_SR)
    b = int(MEASURE_END_S * BASE_SR)
    return buf[a:b]


def _peak_db(x):
    p = jnp.max(jnp.abs(x), axis=0)
    return 20.0 * jnp.log10(jnp.maximum(p, 1e-300))


def _rms_db(x):
    r = jnp.sqrt(jnp.mean(x * x, axis=0))
    return 20.0 * jnp.log10(jnp.maximum(r, 1e-300))


def _h2_h1_db(x, f0):
    mags = goertzel.dft_magnitude(
        x.T, jnp.stack([f0, 2.0 * f0], axis=-1), BASE_SR)
    return 20.0 * jnp.log10(jnp.maximum(mags[..., 1], 1e-300)
                            / jnp.maximum(mags[..., 0], 1e-300))


def run_calibrate(notes, velocities,
                  cfg: tables.CalibrationConfig = tables.CalibrationConfig(),
                  volume=0.40, speaker_char=1.0, mlp=False):
    """Run the full calibrate grid in one batched pass.

    notes: (Nn,) MIDI ints; velocities: (Nv,) MIDI velocity bytes.
    Returns a dict of (Nn, Nv)-shaped numpy arrays (CSV-ready).
    """
    notes = jnp.asarray(notes, dtype=jnp.float64)
    vel_bytes = jnp.asarray(velocities, dtype=jnp.float64)
    m = jnp.broadcast_to(notes[:, None],
                         (notes.shape[0], vel_bytes.shape[0]))
    vel = jnp.broadcast_to(vel_bytes[None, :] / 127.0, m.shape)
    grid_shape = m.shape
    g = m.reshape(-1)
    v = vel.reshape(-1)

    n_samples = int(DURATION_S * BASE_SR)

    # ── T1: raw reed (onset_time=0, no MLP, canonical offline seed) ──
    params = tables.note_params(g)
    freq = params["fundamental_hz"]
    ds_actual = tables.pickup_displacement_scale(g, cfg)
    detuned = freq * variation.freq_detune(g)
    dwell = hammer.dwell_attenuation(v, detuned, params["mode_ratios"])
    amp_offsets = variation.mode_amplitude_offsets(g)
    vel_scale = tables.velocity_scurve(v) ** tables.velocity_exponent(g)
    amplitudes = (params["mode_amplitudes"] * dwell * amp_offsets
                  * vel_scale[..., None])

    reed_params = reed.make_params(
        detuned, params["mode_ratios"], amplitudes,
        params["mode_decay_rates"], jnp.zeros_like(v), v, BASE_SR)
    seed = g.astype(jnp.uint32) * jnp.uint32(2654435761)
    reed_state = reed.init_state(reed_params, seed)
    _, reed_buf = reed.render(reed_params, reed_state, n_samples)  # (n, G)

    reed_peak = jnp.max(jnp.abs(_window(reed_buf)), axis=0)
    y_peak = reed_peak * ds_actual

    # ── T2: pickup ──
    pk_params = pickup.make_params(BASE_SR, ds_actual)
    pk_state = pickup.init_state(g.shape)

    def pk_body(st, x):
        return pickup.step(pk_params, st, x)

    _, t2_buf = jax.lax.scan(pk_body, pk_state, reed_buf)

    # ── T3: output_scale ──
    out_scale = tables.output_scale(g, v, cfg)
    t3_buf = t2_buf * out_scale

    # ── T4: 2× oversampled DK preamp at R_ldr = 1 MΩ ──
    pre_params = dk_preamp.make_params(BASE_SR * 2.0)
    g_ldr = dk_preamp.ldr_conductance(jnp.full(g.shape, 1_000_000.0))

    def t4_body(carry, x):
        os_st, pre = carry
        os_st, (e, o) = allpass.up_step(os_st, x)
        pre, y0 = dk_preamp.step(pre_params, pre, g_ldr, e)
        pre, y1 = dk_preamp.step(pre_params, pre, g_ldr, o)
        os_st, y = allpass.down_step(os_st, y0, y1)
        return (os_st, pre), y

    carry0 = (allpass.init_state(g.shape),
              dk_preamp.init_state(pre_params, g.shape))
    _, t4_buf = jax.lax.scan(t4_body, carry0, t3_buf)

    # ── T5: vol² (audio taper) → power amp (base rate) → speaker → PSG ──
    pa_params = power_amp.make_params(BASE_SR)
    spk_params = speaker.make_params(BASE_SR)
    spk_coeffs = speaker.coeffs_for_character(speaker_char, BASE_SR)

    def t5_body(carry, x):
        pa_st, spk_st = carry
        pa_st, y = power_amp.step(pa_params, pa_st, x * volume * volume,
                                  rail_sag=True)
        spk_st, z = speaker.step(spk_params, spk_st, spk_coeffs, y)
        return (pa_st, spk_st), z * tables.POST_SPEAKER_GAIN

    carry0 = (power_amp.init_state(pa_params, g.shape),
              speaker.init_state(g.shape))
    _, t5_buf = jax.lax.scan(t5_body, carry0, t4_buf)

    # ── metrics ──
    t2w, t3w, t4w, t5w = map(_window, (t2_buf, t3_buf, t4_buf, t5_buf))
    trim = jnp.where(cfg.zero_trim, 0.0, tables.register_trim_db(g))
    t3_rms = _rms_db(t3w)
    t4_pk, t5_pk = _peak_db(t4w), _peak_db(t5w)

    def r(x):
        return np.asarray(x).reshape(grid_shape)

    return {
        "midi": r(g),
        "velocity": r(v * 127.0),
        "ds_at_c4": np.full(grid_shape, cfg.ds_at_c4),
        "ds_actual": r(ds_actual),
        "y_peak": r(y_peak),
        "t2_peak_db": r(_peak_db(t2w)),
        "t2_rms_db": r(_rms_db(t2w)),
        "t2_h2_h1_db": r(_h2_h1_db(t2w, freq)),
        "t3_peak_db": r(_peak_db(t3w)),
        "t3_rms_db": r(t3_rms),
        "t4_peak_db": r(t4_pk),
        "t4_rms_db": r(_rms_db(t4w)),
        "t4_h2_h1_db": r(_h2_h1_db(t4w, freq)),
        "t5_peak_db": r(t5_pk),
        "t5_rms_db": r(_rms_db(t5w)),
        "t5_h2_h1_db": r(_h2_h1_db(t5w, freq)),
        "proxy_db": r(20.0 * jnp.log10(out_scale)),
        "trim_db": r(trim),
        "proxy_error_db": r(t3_rms - cfg.target_db),
        "tanh_compression_db": r(t4_pk - t5_pk),
    }


_NOTE_NAMES = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"]


def midi_note_name(midi):
    midi = int(midi)
    return f"{_NOTE_NAMES[midi % 12]}{midi // 12 - 1}"


def write_calibrate_csv(path, rows):
    """CSV with the reference's 21-column layout (main.rs:1266-1279)."""
    cols = ["midi", "velocity", "ds_at_c4", "ds_actual", "y_peak",
            "t2_peak_db", "t2_rms_db", "t2_h2_h1_db",
            "t3_peak_db", "t3_rms_db",
            "t4_peak_db", "t4_rms_db", "t4_h2_h1_db",
            "t5_peak_db", "t5_rms_db", "t5_h2_h1_db",
            "proxy_db", "trim_db", "proxy_error_db", "tanh_compression_db"]
    with open(path, "w") as f:
        f.write("midi,note_name,velocity,ds_at_c4,ds_actual,y_peak,"
                "t2_peak_db,t2_rms_db,t2_h2_h1_db,"
                "t3_peak_db,t3_rms_db,"
                "t4_peak_db,t4_rms_db,t4_h2_h1_db,"
                "t5_peak_db,t5_rms_db,t5_h2_h1_db,"
                "proxy_db,trim_db,proxy_error_db,tanh_compression_db\n")
        shape = rows["midi"].shape
        for i in range(shape[0]):
            for j in range(shape[1]):
                vals = [rows[c][i, j] for c in cols]
                midi = int(vals[0])
                f.write(f"{midi},{midi_note_name(midi)},{int(round(vals[1]))},"
                        + ",".join(f"{x:.4f}" for x in vals[2:5]) + ","
                        + ",".join(f"{x:.2f}" for x in vals[5:]) + "\n")
