"""openwurli-tpu CLI — measurement / validation / render tools.

Subcommand vocabulary mirrors the reference's `preamp-bench` (21
subcommands, tools/preamp-bench/src/main.rs:37-58) plus `reed-render`
(tools/reed-renderer). Run `python -m openwurli_tpu.cli <cmd> --help`.

Everything renders batched where the reference loops: `calibrate` computes
its whole note×velocity grid in one pass, `sweep`/`tremolo-sweep` vectorise
over frequencies / resistances.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _jax():
    import jax

    return jax


def _fmt_db(x):
    return f"{x:.2f} dB"


# ── preamp measurement helpers ───────────────────────────────────────────


def _measure_preamp_gain_batch(freqs, amplitude, r_ldrs, sr,
                               settle=0.3, measure=0.2):
    """Vectorised gain measurement: the whole (freq, R_ldr) grid advances
    as ONE batched scan (the solvers broadcast over leading dims)."""
    import jax
    import jax.numpy as jnp

    from openwurli_tpu.circuits import dk_preamp as dk

    freqs = np.atleast_1d(np.asarray(freqs, dtype=np.float64))
    r_ldrs = np.broadcast_to(
        np.asarray(r_ldrs, dtype=np.float64), freqs.shape)
    params = dk.make_params(sr)
    state = dk.init_state(params, batch_shape=freqs.shape)
    g = dk.ldr_conductance(jnp.asarray(r_ldrs))
    n = int(sr * (settle + measure))
    t = np.arange(n) / sr
    xs = jnp.asarray(amplitude * np.sin(
        2 * np.pi * freqs[None, :] * t[:, None]))  # (n, F)

    @jax.jit
    def run(state, xs):
        def body(st, x):
            return dk.step(params, st, g, x)

        return jax.lax.scan(body, state, xs)

    _, out = run(state, xs)
    peaks = np.abs(np.asarray(out[int(sr * settle):])).max(axis=0)
    return peaks / amplitude


def _measure_preamp_gain(freq, amplitude, r_ldr, sr, settle=0.3, measure=0.2):
    return float(_measure_preamp_gain_batch([freq], amplitude, [r_ldr], sr,
                                            settle, measure)[0])


def cmd_gain(args):
    sr = args.sr
    gain = _measure_preamp_gain(args.freq, args.amplitude, args.r_ldr, sr)
    print(f"Gain @ {args.freq:.0f} Hz, R_ldr={args.r_ldr:.0f} Ω: "
          f"{gain:.3f}x ({20*np.log10(gain):.2f} dB)")


def cmd_sweep(args):
    freqs = np.geomspace(args.lo, args.hi, args.points)
    gains = _measure_preamp_gain_batch(freqs, args.amplitude, args.r_ldr,
                                       args.sr)
    print("freq_hz,gain_db")
    for f, g in zip(freqs, gains):
        print(f"{f:.1f},{20*np.log10(g):.2f}")


def cmd_harmonics(args):
    import jax
    import jax.numpy as jnp

    from openwurli_tpu.calib import goertzel
    from openwurli_tpu.circuits import dk_preamp as dk

    sr = args.sr
    params = dk.make_params(sr)
    state = dk.init_state(params)
    g = dk.ldr_conductance(args.r_ldr)
    n = int(sr * 0.5)
    t = np.arange(n) / sr
    xs = jnp.asarray(args.amplitude * np.sin(2 * np.pi * args.freq * t))

    @jax.jit
    def run(state, xs):
        def body(st, x):
            return dk.step(params, st, g, x)

        return jax.lax.scan(body, state, xs)

    _, out = run(state, xs)
    seg = out[n // 2:]
    mags = np.asarray(goertzel.dft_magnitude(
        seg, jnp.asarray([args.freq * k for k in (1, 2, 3, 4, 5)]), sr))
    h1 = mags[0]
    thd = np.sqrt((mags[1:] ** 2).sum()) / h1
    print(f"H1: {20*np.log10(h1):.2f} dB")
    for k in range(2, 6):
        print(f"H{k}/H1: {20*np.log10(mags[k-1]/h1):.2f} dB")
    print(f"THD (H2-H5): {100*thd:.4f} %")


def cmd_tremolo_sweep(args):
    rs = np.geomspace(args.lo, args.hi, args.points)
    gains = _measure_preamp_gain_batch(
        np.full_like(rs, args.freq), args.amplitude, rs, args.sr)
    print("r_ldr_ohm,gain_db")
    for r, g in zip(rs, gains):
        print(f"{r:.0f},{20*np.log10(g):.2f}")


# ── renders ──────────────────────────────────────────────────────────────


def _render_di(note, velocity, duration, sr):
    """DI path: reed → pickup → output_scale → 2×OS preamp @1 MΩ.

    Matches the reference's `preamp-bench render` chain (the path the ML
    pipeline's model renders use — no amp/speaker)."""
    from openwurli_tpu import di

    return di.render_di(note, velocity, duration, sr, mlp_enabled=True)


def cmd_render(args):
    from openwurli_tpu.io import wav

    out = _render_di(args.note, args.velocity / 127.0, args.duration, args.sr)
    peak = np.abs(out).max()
    if args.normalize and peak > 0:
        out = out / peak * 0.9
    wav.write_wav(args.output, out, args.sr, bits=24)
    print(f"Rendered note {args.note} v={args.velocity} → {args.output} "
          f"({len(out)} samples, peak {peak:.4f})")


def cmd_reed_render(args):
    """reed-renderer parity: voice-only (reed+pickup) → 24-bit WAV."""
    from openwurli_tpu import voice
    from openwurli_tpu.io import wav

    notes = ([33, 40, 48, 55, 62, 69, 76, 84, 96] if args.sweep
             else [args.note])
    for n in notes:
        out = np.asarray(voice.render_note(
            n, args.velocity / 127.0, args.duration, args.sr))
        path = (args.output if len(notes) == 1
                else args.output.replace(".wav", f"_{n}.wav"))
        peak = np.abs(out).max()
        if peak > 0:
            out = out / peak * 0.9
        wav.write_wav(path, out, args.sr, bits=24)
        print(f"note {n} v={args.velocity} → {path}")


def cmd_render_poly(args):
    from openwurli_tpu.engine import Engine
    from openwurli_tpu.io import wav

    notes = [int(x) for x in args.notes.split(",")]
    if getattr(args, "fast", False):
        from openwurli_tpu import fast

        out = fast.render_chord(
            notes, args.velocity / 127.0, args.duration, args.sr,
            volume=args.volume, depth=args.tremolo,
            character=args.speaker, warm_seconds=0.6,
            noise_level=getattr(args, "noise_level", 0.0))
        wav.write_wav(args.output, np.asarray(out, np.float64), args.sr,
                      bits=24)
        print(f"Rendered {len(notes)} notes × {args.duration}s (fused "
              f"kernel path) → {args.output} "
              f"(peak {np.abs(out).max():.4f})")
        return
    eng = Engine(args.sr)
    eng.set_volume(args.volume)
    eng.set_tremolo_depth(args.tremolo)
    eng.set_speaker_character(args.speaker)
    if getattr(args, "noise_level", 0.0) > 0.0:
        eng.set_noise_enabled(True)
        eng.set_noise_gain(args.noise_level)
    eng.render(1536)
    for n in notes:
        eng.note_on(n, args.velocity / 127.0)
    out = np.asarray(eng.render(int(args.sr * args.duration)))
    wav.write_wav(args.output, out, args.sr, bits=24)
    print(f"Rendered {len(notes)} notes × {args.duration}s → {args.output} "
          f"(peak {np.abs(out).max():.4f})")


def cmd_render_midi(args):
    from openwurli_tpu.engine import Engine
    from openwurli_tpu.io import midi_file, wav

    if getattr(args, "fast", False):
        from openwurli_tpu import fast

        out = fast.render_midi_file(
            args.input, args.sr, tail_seconds=args.tail,
            volume=args.volume, depth=args.tremolo,
            character=args.speaker,
            noise_level=getattr(args, "noise_level", 0.0),
            parallel=not getattr(args, "serial", False))
        wav.write_wav(args.output, np.asarray(out, np.float64), args.sr,
                      bits=24)
        print(f"Rendered {args.input} ({len(out)/args.sr:.1f}s, fused "
              f"kernel event path) → {args.output} "
              f"(peak {np.abs(out).max() if len(out) else 0.0:.4f})")
        return

    events, total_s = midi_file.load_events(args.input)
    eng = Engine(args.sr)
    eng.set_volume(args.volume)
    eng.set_tremolo_depth(args.tremolo)
    eng.set_speaker_character(args.speaker)
    if getattr(args, "noise_level", 0.0) > 0.0:
        eng.set_noise_enabled(True)
        eng.set_noise_gain(args.noise_level)
    eng.render(1536)

    chunks = []
    cursor = 0.0
    for ev in events:
        gap = int((ev.time_s - cursor) * args.sr)
        if gap > 0:
            chunks.append(np.asarray(eng.render(gap)))
            cursor = ev.time_s
        if ev.kind == "on":
            eng.note_on(ev.note, ev.velocity / 127.0)
        elif ev.kind == "off":
            eng.note_off(ev.note)
        elif ev.kind == "sustain":
            eng.set_sustain(ev.velocity >= 64)
    tail = int((total_s - cursor + args.tail) * args.sr)
    if tail > 0:
        chunks.append(np.asarray(eng.render(tail)))
    out = np.concatenate(chunks) if chunks else np.zeros(0)
    wav.write_wav(args.output, out, args.sr, bits=24)
    print(f"Rendered {args.input} ({len(events)} events, "
          f"{len(out)/args.sr:.1f}s) → {args.output}")


# ── audits / calibration ─────────────────────────────────────────────────


def cmd_alias_audit(args):
    from openwurli_tpu.calib import alias_audit

    if args.note:
        entries = [(args.note, alias_audit.STIMULUS_VELOCITY,
                    alias_audit.run_with_note(args.note))]
    else:
        entries = alias_audit.run_sweep()
    report = []
    for note, vel, r in entries:
        print(f"note {note} v={vel}: f0={r.f0_hz:.1f} Hz  "
              f"H1 {r.h1_dbfs:.1f} dBFS  max_step_up {r.max_step_up_db:.3f} dB"
              f" (from H{r.max_step_up_from_harmonic})  "
              f"hf_band {r.hf_band_dbc:.3f} dBc")
        report.append({
            "note": note, "velocity": vel, "f0_hz": r.f0_hz,
            "max_step_up_db": r.max_step_up_db,
            "hf_band_dbc": r.hf_band_dbc,
            "harmonic_dbc": r.harmonic_dbc,
        })
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.output}")


def cmd_intermod_audit(args):
    import jax.numpy as jnp

    from openwurli_tpu import tables

    midis = jnp.arange(tables.MIDI_LO, tables.MIDI_HI + 1)
    rep = tables.intermod_risk(midis)
    max_risk = np.asarray(rep["max_risk"])
    total = np.asarray(rep["total_risk"])
    print("midi,f0_hz,mu,max_risk,total_risk")
    for i, m in enumerate(range(tables.MIDI_LO, tables.MIDI_HI + 1)):
        print(f"{m},{float(np.asarray(rep['fundamental_hz'])[i]):.1f},"
              f"{float(np.asarray(rep['mu'])[i]):.3f},"
              f"{max_risk[i]:.5f},{total[i]:.5f}")
    worst = int(np.argmax(max_risk)) + tables.MIDI_LO
    print(f"# worst: MIDI {worst} max_risk {max_risk.max():.5f}",
          file=sys.stderr)


def cmd_bark_audit(args):
    """H2/H1 at each chain stage for one note (pickup bark tracking)."""
    from openwurli_tpu.calib import calibrate

    rows = calibrate.run_calibrate([args.note], [args.velocity])
    for tap in ("t2", "t4", "t5"):
        print(f"{tap} H2/H1: {rows[f'{tap}_h2_h1_db'][0,0]:.2f} dB")
    print(f"y_peak: {rows['y_peak'][0,0]:.3f}  "
          f"ds_actual: {rows['ds_actual'][0,0]:.3f}")


def cmd_calibrate(args):
    from openwurli_tpu import tables
    from openwurli_tpu.calib import calibrate

    notes = [int(x) for x in args.notes.split(",")]
    vels = [int(x) for x in args.velocities.split(",")]
    cfg = tables.CalibrationConfig(
        ds_at_c4=args.ds_at_c4,
        ds_clamp=(0.02, args.ds_clamp_max),
        zero_trim=args.zero_trim,
    )
    rows = calibrate.run_calibrate(notes, vels, cfg, volume=args.volume,
                                   speaker_char=args.speaker, mlp=args.mlp)
    calibrate.write_calibrate_csv(args.output, rows)
    print(f"Calibrate: {len(notes)} notes × {len(vels)} velocities "
          f"→ {args.output}")


def cmd_sensitivity(args):
    from openwurli_tpu import tables
    from openwurli_tpu.calib import calibrate

    notes = [int(x) for x in args.notes.split(",")]
    vels = [int(x) for x in args.velocities.split(",")]
    ds_values = [float(x) for x in args.ds_grid.split(",")]
    with open(args.output, "w") as f:
        f.write("ds_at_c4,midi,velocity,t2_h2_h1_db,t5_rms_db,y_peak\n")
        for ds in ds_values:
            cfg = tables.CalibrationConfig(ds_at_c4=ds)
            rows = calibrate.run_calibrate(notes, vels, cfg)
            for i in range(len(notes)):
                for j in range(len(vels)):
                    f.write(f"{ds},{notes[i]},{vels[j]},"
                            f"{rows['t2_h2_h1_db'][i,j]:.2f},"
                            f"{rows['t5_rms_db'][i,j]:.2f},"
                            f"{rows['y_peak'][i,j]:.4f}\n")
    print(f"Sensitivity grid → {args.output}")


def cmd_centroid_track(args):
    from openwurli_tpu.calib import goertzel  # noqa: F401

    out = _render_di(args.note, args.velocity / 127.0, args.duration, args.sr)
    win = int(args.sr * 0.05)
    print("t_s,centroid_hz")
    for i in range(len(out) // win):
        seg = out[i * win:(i + 1) * win]
        spec = np.abs(np.fft.rfft(seg))
        freqs = np.fft.rfftfreq(len(seg), 1 / args.sr)
        c = (spec * freqs).sum() / max(spec.sum(), 1e-12)
        print(f"{i*win/args.sr:.3f},{c:.1f}")


def cmd_overshoot(args):
    out = _render_di(args.note, args.velocity / 127.0, 0.3, args.sr)
    sr = args.sr
    attack_peak = np.abs(out[: int(0.010 * sr)]).max()
    sustain = out[int(0.100 * sr):int(0.200 * sr)]
    sustain_rms = np.sqrt((sustain**2).mean())
    ratio_db = 20 * np.log10(max(attack_peak, 1e-12)
                             / max(sustain_rms, 1e-12))
    print(f"note {args.note}: 0-10ms peak {attack_peak:.4f}, "
          f"100-200ms RMS {sustain_rms:.4f}, overshoot {ratio_db:.2f} dB")


# ── shadow-pump characterisation ─────────────────────────────────────────


def _pump_trace(r_ldr_fn, seconds, sr):
    """Run the shadow preamp solver with a time-varying R_ldr, record the
    pump (shadow OUT deviation from its settled value).

    r_ldr_fn(t) may return (n,) for one trace or (n, P) for a whole grid
    of traces advanced in one batched scan."""
    import jax
    import jax.numpy as jnp

    from openwurli_tpu.circuits import dk_preamp as dk

    params = dk.make_params(sr)
    n = int(seconds * sr)
    rs_np = np.asarray(r_ldr_fn(np.arange(n) / sr))
    batch_shape = rs_np.shape[1:]
    state = dk.init_state(params, batch_shape=batch_shape)
    rs = jnp.asarray(rs_np)
    x0 = jnp.zeros(batch_shape, dtype=jnp.float64)

    @jax.jit
    def run(state, rs):
        def body(st, r):
            g = dk.ldr_conductance(r)
            st, _ = dk.step(params, st, g, x0)
            return st, st.v[..., 1, dk.OUT]  # shadow OUT voltage

        return jax.lax.scan(body, state, rs)

    _, shadow_out = run(state, rs)
    return np.asarray(shadow_out)


def cmd_pump_trace(args):
    trace = _pump_trace(lambda t: np.full_like(t, args.r_ldr), args.duration,
                        args.sr)
    print("t_s,shadow_out_v")
    step = max(1, len(trace) // 2000)
    for i in range(0, len(trace), step):
        print(f"{i/args.sr:.5f},{trace[i]:.6f}")


def cmd_pump_sweep(args):
    rs = np.geomspace(args.lo, args.hi, args.points)
    tr = _pump_trace(
        lambda t: np.broadcast_to(rs, (len(t), len(rs))), 0.5, args.sr)
    tails = tr[len(tr) // 2:]
    print("r_ldr_ohm,pump_pp_v")
    for k, r in enumerate(rs):
        print(f"{r:.0f},{tails[:, k].max()-tails[:, k].min():.6f}")


def cmd_pump_step(args):
    def r_fn(t):
        return np.where(t < args.duration / 2, args.r_a, args.r_b)

    tr = _pump_trace(r_fn, args.duration, args.sr)
    print("t_s,shadow_out_v")
    step = max(1, len(tr) // 4000)
    for i in range(0, len(tr), step):
        print(f"{i/args.sr:.5f},{tr[i]:.6f}")


def cmd_pump_sinusoid(args):
    def r_fn(t):
        log_mid = (np.log(args.lo) + np.log(args.hi)) / 2
        log_amp = (np.log(args.hi) - np.log(args.lo)) / 2
        return np.exp(log_mid + log_amp * np.sin(2 * np.pi * args.rate * t))

    tr = _pump_trace(r_fn, args.duration, args.sr)
    tail = tr[len(tr) // 2:]
    print(f"pump pp under {args.rate} Hz log-R modulation: "
          f"{tail.max()-tail.min():.4f} V")


def cmd_pump_spike(args):
    rs = np.geomspace(30_000.0, 70_000.0, 41)
    tr_all = _pump_trace(
        lambda t: np.broadcast_to(rs, (len(t), len(rs))), 0.3, args.sr)
    print("r_ldr_ohm,pump_pp_v")
    for k, r in enumerate(rs):
        tail = tr_all[len(tr_all) // 2:, k]
        print(f"{r:.0f},{tail.max()-tail.min():.6f}")


def cmd_bench_reed(args):
    import time

    import jax
    import jax.numpy as jnp

    from openwurli_tpu import voice

    sr = args.sr
    notes = jnp.asarray(np.tile(np.arange(33, 97), args.voices // 64 + 1)
                        [: args.voices], dtype=jnp.float64)
    vels = jnp.full(notes.shape, 0.8)
    vparams, detuned = voice.note_on_params(notes, vels, sr,
                                            mlp_enabled=False)
    state = voice.init_state(vparams, detuned, vels, sr,
                             voice.default_note_seed(notes))
    n = int(sr * args.duration)

    render = jax.jit(lambda st: voice.render(vparams, st, n))
    _st, out = render(state)
    np.asarray(out)  # host transfer — forces completion (compile pass)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        _st, out = render(state)
        np.asarray(out)
    wall = (time.time() - t0) / reps
    rtf = args.duration / wall
    print(f"{args.voices} voices × {args.duration}s at {sr:.0f} Hz: "
          f"{wall:.3f}s wall → {rtf:.0f}x realtime")


# ── argument parsing ─────────────────────────────────────────────────────


def build_parser():
    p = argparse.ArgumentParser(
        prog="openwurli-tpu",
        description="Wurlitzer 200A TPU-native DSP validation & render tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, fn, **kw):
        sp = sub.add_parser(name, **kw)
        sp.set_defaults(fn=fn)
        return sp

    sp = add("gain", cmd_gain, help="Measure preamp gain at one frequency")
    sp.add_argument("--freq", type=float, default=1000.0)
    sp.add_argument("--amplitude", type=float, default=0.001)
    sp.add_argument("--r-ldr", type=float, default=1_000_000.0)
    sp.add_argument("--sr", type=float, default=88_200.0)

    sp = add("sweep", cmd_sweep, help="Frequency response sweep (log)")
    sp.add_argument("--lo", type=float, default=20.0)
    sp.add_argument("--hi", type=float, default=20_000.0)
    sp.add_argument("--points", type=int, default=25)
    sp.add_argument("--amplitude", type=float, default=0.001)
    sp.add_argument("--r-ldr", type=float, default=1_000_000.0)
    sp.add_argument("--sr", type=float, default=88_200.0)

    sp = add("harmonics", cmd_harmonics, help="Harmonic distortion (H2-H5)")
    sp.add_argument("--freq", type=float, default=440.0)
    sp.add_argument("--amplitude", type=float, default=0.005)
    sp.add_argument("--r-ldr", type=float, default=1_000_000.0)
    sp.add_argument("--sr", type=float, default=88_200.0)

    sp = add("tremolo-sweep", cmd_tremolo_sweep,
             help="Gain vs LDR resistance")
    sp.add_argument("--lo", type=float, default=8_000.0)
    sp.add_argument("--hi", type=float, default=1_000_000.0)
    sp.add_argument("--points", type=int, default=13)
    sp.add_argument("--freq", type=float, default=1000.0)
    sp.add_argument("--amplitude", type=float, default=0.001)
    sp.add_argument("--sr", type=float, default=88_200.0)

    sp = add("render", cmd_render, help="Reed→pickup→preamp DI render → WAV")
    sp.add_argument("-n", "--note", type=int, default=69)
    sp.add_argument("-v", "--velocity", type=int, default=100)
    sp.add_argument("--duration", type=float, default=2.0)
    sp.add_argument("--sr", type=float, default=44_100.0)
    sp.add_argument("--normalize", action="store_true")
    sp.add_argument("-o", "--output", default="/tmp/render.wav")

    sp = add("reed-render", cmd_reed_render,
             help="Voice-only render → 24-bit WAV (reed-renderer parity)")
    sp.add_argument("-n", "--note", type=int, default=69)
    sp.add_argument("-v", "--velocity", type=int, default=100)
    sp.add_argument("--duration", type=float, default=2.0)
    sp.add_argument("--sr", type=float, default=44_100.0)
    sp.add_argument("--sweep", action="store_true",
                    help="render 9 notes across the keyboard")
    sp.add_argument("-o", "--output", default="/tmp/reed.wav")

    sp = add("render-poly", cmd_render_poly,
             help="Simultaneous notes through the shared chain")
    sp.add_argument("--notes", default="48,55,60,64,67,72")
    sp.add_argument("-v", "--velocity", type=int, default=100)
    sp.add_argument("--duration", type=float, default=10.0)
    sp.add_argument("--volume", type=float, default=0.5)
    sp.add_argument("--tremolo", type=float, default=0.5)
    sp.add_argument("--speaker", type=float, default=0.0)
    sp.add_argument("--sr", type=float, default=44_100.0)
    sp.add_argument("-o", "--output", default="/tmp/poly.wav")
    sp.add_argument("--fast", action="store_true",
                    help="fused-Pallas batch path (sustained render, "
                         "~150x realtime on TPU; see openwurli_tpu.fast)")
    sp.add_argument("--noise-level", type=float, default=0.0,
                    help="circuit thermal-noise gain (reference "
                         "'Authentic Noise'/'Noise Level'; 0 = off)")

    sp = add("render-midi", cmd_render_midi,
             help="Render a MIDI file through the full chain")
    sp.add_argument("input")
    sp.add_argument("--volume", type=float, default=0.5)
    sp.add_argument("--tremolo", type=float, default=0.5)
    sp.add_argument("--speaker", type=float, default=0.0)
    sp.add_argument("--tail", type=float, default=2.0)
    sp.add_argument("--sr", type=float, default=44_100.0)
    sp.add_argument("-o", "--output", default="/tmp/midi.wav")
    sp.add_argument("--fast", action="store_true",
                    help="event-capable fused-Pallas path (note-off/"
                         "damper/sustain resolved host-side; "
                         "fast.render_midi_file)")
    sp.add_argument("--serial", action="store_true",
                    help="with --fast: force the serial block-streamed "
                         "path instead of the time-parallel renderer")
    sp.add_argument("--noise-level", type=float, default=0.0,
                    help="circuit thermal-noise gain (reference "
                         "'Authentic Noise'/'Noise Level'; 0 = off)")

    sp = add("alias-audit", cmd_alias_audit,
             help="Click-band aliasing audit (H6-H11 plateau + HF hash)")
    sp.add_argument("--note", type=int, default=0)
    sp.add_argument("-o", "--output", default="")

    add("intermod-audit", cmd_intermod_audit,
        help="Inharmonic intermod beating risk per note")

    sp = add("bark-audit", cmd_bark_audit,
             help="H2/H1 at each chain stage")
    sp.add_argument("-n", "--note", type=int, default=60)
    sp.add_argument("-v", "--velocity", type=int, default=127)

    sp = add("calibrate", cmd_calibrate,
             help="Gain chain at 5 tap points → CSV")
    sp.add_argument("--notes",
                    default="36,40,44,48,52,56,60,64,68,72,76,80,84")
    sp.add_argument("--velocities", default="40,80,127")
    sp.add_argument("--ds-at-c4", type=float, default=0.85)
    sp.add_argument("--ds-clamp-max", type=float, default=0.95)
    sp.add_argument("--volume", type=float, default=0.40)
    sp.add_argument("--speaker", type=float, default=1.0)
    sp.add_argument("--zero-trim", action="store_true")
    sp.add_argument("--mlp", action="store_true")
    sp.add_argument("-o", "--output", default="/tmp/calibrate.csv")

    sp = add("sensitivity", cmd_sensitivity, help="Multi-DS grid sweep → CSV")
    sp.add_argument("--notes", default="36,48,60,72,84")
    sp.add_argument("--velocities", default="80,127")
    sp.add_argument("--ds-grid", default="0.65,0.75,0.85,0.95")
    sp.add_argument("-o", "--output", default="/tmp/sensitivity.csv")

    sp = add("centroid-track", cmd_centroid_track,
             help="Spectral centroid over time")
    sp.add_argument("-n", "--note", type=int, default=60)
    sp.add_argument("-v", "--velocity", type=int, default=100)
    sp.add_argument("--duration", type=float, default=2.0)
    sp.add_argument("--sr", type=float, default=44_100.0)

    sp = add("overshoot", cmd_overshoot,
             help="Onset overshoot (0-10ms peak vs 100-200ms RMS)")
    sp.add_argument("-n", "--note", type=int, default=60)
    sp.add_argument("-v", "--velocity", type=int, default=100)
    sp.add_argument("--sr", type=float, default=44_100.0)

    sp = add("pump-trace", cmd_pump_trace,
             help="Shadow pump time series at fixed R_ldr")
    sp.add_argument("--r-ldr", type=float, default=47_500.0)
    sp.add_argument("--duration", type=float, default=1.0)
    sp.add_argument("--sr", type=float, default=88_200.0)

    sp = add("pump-sweep", cmd_pump_sweep,
             help="Steady-state pump vs R_ldr")
    sp.add_argument("--lo", type=float, default=8_000.0)
    sp.add_argument("--hi", type=float, default=1_000_000.0)
    sp.add_argument("--points", type=int, default=13)
    sp.add_argument("--sr", type=float, default=88_200.0)

    sp = add("pump-step", cmd_pump_step, help="Pump step response R_a→R_b")
    sp.add_argument("--r-a", type=float, default=1_000_000.0)
    sp.add_argument("--r-b", type=float, default=19_000.0)
    sp.add_argument("--duration", type=float, default=1.0)
    sp.add_argument("--sr", type=float, default=88_200.0)

    sp = add("pump-sinusoid", cmd_pump_sinusoid,
             help="Pump under sinusoidal log-R modulation")
    sp.add_argument("--lo", type=float, default=9_000.0)
    sp.add_argument("--hi", type=float, default=1_000_000.0)
    sp.add_argument("--rate", type=float, default=5.5)
    sp.add_argument("--duration", type=float, default=2.0)
    sp.add_argument("--sr", type=float, default=88_200.0)

    sp = add("pump-spike", cmd_pump_spike,
             help="Probe the ~47.5 kΩ pump resonance region")
    sp.add_argument("--sr", type=float, default=88_200.0)

    sp = add("bench-reed", cmd_bench_reed,
             help="Reed-bank realtime-ratio microbenchmark")
    sp.add_argument("--voices", type=int, default=64)
    sp.add_argument("--duration", type=float, default=1.0)
    sp.add_argument("--sr", type=float, default=44_100.0)

    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
