#!/usr/bin/env python3
"""Train the onset/pitch note-extraction model on self-rendered audio.

The reference's ML stage 1 leans on the pretrained basic-pitch network
(reference ml/extract_notes.py:1-10). This trains our replacement
(openwurli_tpu/calib/onset_model.py) from scratch on mixtures synthesized
from this repo's OWN fast-path renders — single notes across the keyboard
and velocity range, placed at random onsets with random gains, polyphony
and noise — so the detector is specialized to the instrument it will
transcribe.

Usage:
    python tools/train_onset_model.py                    # TPU render + train
    python tools/train_onset_model.py --interpret --clips 20 --steps 200
    python tools/train_onset_model.py --out /tmp/op.npz

Writes openwurli_tpu/data/onset_pitch.npz and prints held-out metrics.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def render_note_pool(sr, seconds, interpret, vels=(0.4, 0.7, 1.0),
                     midi_step=1, depths=(0.0, 0.4, 0.8)):
    """Render every (midi 36-96 × velocity × tremolo depth) single note
    through the full fast-path chain → dict[(midi, vel, depth)] = (T,)
    float32. Depth diversity keeps the detector from keying on one
    tremolo AM signature (round-3 model trained at depth 0.4 only).

    All combinations go into ONE render_grid call per depth with the
    stream count padded to a multiple of 128: odd stream counts hand the
    mono-chain kernel a ragged lane dimension and the Mosaic compile
    crawls."""
    from openwurli_tpu import fast
    from openwurli_tpu.calib.onset_model import MIDI_HI, MIDI_LO

    midis = np.arange(MIDI_LO, MIDI_HI + 1, midi_step, dtype=np.float64)
    combos = [(int(m), v) for v in vels for m in midis]
    s_pad = max(128, -(-len(combos) // 128) * 128) if not interpret \
        else len(combos)
    grid = np.full(s_pad, 60.0)
    vel_col = np.full(s_pad, 0.5)
    for i, (m, v) in enumerate(combos):
        grid[i] = m
        vel_col[i] = v
    pool = {}
    for depth in depths:
        out = np.asarray(fast.render_grid(
            grid[:, None], vel_col[:, None], seconds, sr,
            volume=0.5, depth=depth, character=0.0, interpret=interpret))
        for i, (m, v) in enumerate(combos):
            pool[(m, v, depth)] = out[:, i].astype(np.float32)

    # Voice-only (DI) timbre family: the pipeline also meets recordings
    # without the amp/speaker coloration (reference ml renders the DI
    # path, render_model_notes.py) — without these the model makes
    # octave errors on voice-path audio (caught by the pipeline
    # end-to-end test in round 4).
    import jax.numpy as jnp

    from openwurli_tpu.kernels import voice_bank as vb

    params, _ = vb.make_kernel_params(grid, vel_col, sr, lanes=s_pad)
    t_pad = -(-int(seconds * sr) // 512) * 512
    voices = np.asarray(vb.render_voice_bank(
        jnp.asarray(params), t_pad, interpret=interpret,
        steady=vb.steady_limits(np.asarray(params)), events=False))
    for i, (m, v) in enumerate(combos):
        seg = voices[:int(seconds * sr), i].astype(np.float32)
        peak = max(float(np.abs(seg).max()), 1e-9)
        pool[(m, v, "di")] = 0.3 * seg / peak
    print(f"  rendered {len(combos)} (note, velocity) combinations × "
          f"({len(depths)} tremolo depths + DI) ({s_pad}-stream calls)")
    return pool


def add_synthetic_tones(pool, sr, seconds):
    """Augment the pool with plain decaying harmonic tones (one per MIDI
    note): the extractor must also work on audio that did NOT pass
    through this repo's chain — DI captures, other recordings, test
    tones — so a second timbre family keeps it from overfitting the
    chain's coloration."""
    from openwurli_tpu.calib.onset_model import MIDI_HI, MIDI_LO

    t = np.arange(int(seconds * sr)) / sr
    for midi in range(MIDI_LO, MIDI_HI + 1):
        f0 = 440.0 * 2.0 ** ((midi - 69) / 12.0)
        env = np.exp(-3.0 * t) * np.minimum(t / 0.01, 1.0)
        tone = env * (np.sin(2 * np.pi * f0 * t)
                      + 0.45 * np.sin(2 * np.pi * 2 * f0 * t)
                      + 0.15 * np.sin(2 * np.pi * 3 * f0 * t))
        pool[(midi, "syn")] = (0.1 * tone).astype(np.float32)
    return pool


def synth_mixtures(pool, sr, n_clips, clip_seconds, seed):
    """Random mixtures + labels: list of (audio, [(onset_s, midi), ...])."""
    rng = np.random.default_rng(seed)
    keys = list(pool.keys())
    t_len = int(clip_seconds * sr)
    clips = []
    for _ in range(n_clips):
        audio = np.zeros(t_len, dtype=np.float64)
        k = int(rng.integers(1, 5))
        events = []
        for _ in range(k):
            key = keys[rng.integers(len(keys))]
            midi = key[0]
            onset_s = float(rng.uniform(0.1, clip_seconds - 0.6))
            gain = 10.0 ** (rng.uniform(-12.0, 0.0) / 20.0)
            i0 = int(onset_s * sr)
            seg = pool[key].astype(np.float64).copy()
            # fade the pool clip's hard cut (a real note rings out; the
            # cut's broadband splatter would teach spurious onsets)
            n_f = min(len(seg), int(0.05 * sr))
            seg[-n_f:] *= np.linspace(1.0, 0.0, n_f)
            n = min(len(seg), t_len - i0)
            audio[i0:i0 + n] += gain * seg[:n]
            events.append((onset_s, midi))
        noise_db = rng.uniform(-70.0, -40.0)
        audio += rng.normal(0.0, 10.0 ** (noise_db / 20.0), t_len)
        if rng.random() < 0.3:   # mains hum
            hum_db = rng.uniform(-70.0, -50.0)
            audio += (10.0 ** (hum_db / 20.0)
                      * np.sin(2 * np.pi * 50.0 * np.arange(t_len) / sr))
        events.sort()
        clips.append((audio.astype(np.float32), events))
    return clips


def label_clip(audio, events, sr):
    """(frames X, onset map, note map, note mask) for one mixture.

    Maps are (n_frames, N_NOTES) multi-hot — per-(frame, pitch)
    supervision (basic-pitch structure). The note-presence map is
    positively supervised over [onset, onset+0.5 s] per pitch and MASKED
    over the following ring-out window (the note is still audible there
    but for an unknown, decaying span — supervising 0 would teach the
    head to ignore real note energy)."""
    from openwurli_tpu.calib import onset_model as om

    feats = om.features(audio, sr)
    xs = om.context_windows(feats)
    n = len(feats)
    _, hop = om.frame_params(sr)
    hop_s = hop / sr
    y_on = np.zeros((n, om.N_NOTES), dtype=np.float32)
    y_note = np.zeros((n, om.N_NOTES), dtype=np.float32)
    mask = np.ones((n, om.N_NOTES), dtype=np.float32)
    span = int(round(0.5 / hop_s))
    ring = int(round(2.5 / hop_s))
    for onset_s, midi in events:
        f = int(round(onset_s / hop_s))
        p = int(midi) - om.MIDI_LO
        if not (0 <= p < om.N_NOTES):
            continue
        for df in (0, 1):
            if 0 <= f + df < n:
                y_on[f + df, p] = 1.0
        hi = min(f + span, n)
        y_note[f:hi, p] = 1.0
        mask[hi:min(f + ring, n), p] = 0.0
    return xs, y_on, y_note, mask


def _null_ctx():
    import contextlib

    return contextlib.nullcontext()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sr", type=float, default=16000.0)
    ap.add_argument("--seconds", type=float, default=1.5,
                    help="single-note render length")
    ap.add_argument("--clip-seconds", type=float, default=3.0)
    ap.add_argument("--clips", type=int, default=400)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke mode (Pallas interpreter)")
    ap.add_argument("--pool-npz", default="",
                    help="cache the rendered note pool here")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    else:
        plats = os.environ.get("JAX_PLATFORMS", "")
        if plats and "cpu" not in plats.split(","):
            jax.config.update("jax_platforms", plats + ",cpu")

    from openwurli_tpu.calib import onset_model as om

    if args.pool_npz and os.path.exists(args.pool_npz):
        import ast

        with np.load(args.pool_npz) as z:
            pool = {tuple(ast.literal_eval(k)): z[k] for k in z.files}
        print(f"loaded pool: {len(pool)} notes")
    else:
        print("rendering note pool (fast path)...")
        pool = render_note_pool(
            args.sr, args.seconds, args.interpret,
            vels=(0.7,) if args.interpret else (0.4, 0.7, 1.0),
            midi_step=12 if args.interpret else 1)
        if args.pool_npz:
            np.savez_compressed(args.pool_npz,
                                **{str(k): v for k, v in pool.items()})

    add_synthetic_tones(pool, args.sr, min(args.seconds, 1.5))
    print(f"synthesizing {args.clips} mixtures "
          f"({len(pool)} pool entries incl. synthetic tones)...")
    clips = synth_mixtures(pool, args.sr, args.clips, args.clip_seconds,
                           args.seed)
    n_val = max(1, args.clips // 10)
    xs, os_, ns_, ms_ = zip(*(label_clip(a, e, args.sr) for a, e in clips))
    x_tr = np.concatenate(xs[n_val:])
    o_tr = np.concatenate(os_[n_val:])
    n_tr = np.concatenate(ns_[n_val:])
    m_tr = np.concatenate(ms_[n_val:])
    x_va = np.concatenate(xs[:n_val])
    o_va = np.concatenate(os_[:n_val])
    print(f"frames: train {len(x_tr)}, val {len(x_va)} "
          f"(onset-cell rate {o_tr.mean():.5f})")

    # The conv trunk is ~2 GFLOP/step at batch 512 — hours on the 1-core
    # CPU, minutes on the accelerator (per-step tunnel RTT dominates);
    # train on the default device unless forced local.
    dev_ctx = (jax.default_device(jax.devices("cpu")[0])
               if args.interpret else _null_ctx())
    with dev_ctx:
        params = om.train(x_tr, o_tr, n_tr, note_mask=m_tr,
                          steps=args.steps, seed=args.seed,
                          log_every=max(args.steps // 10, 1))

        import jax.numpy as jnp

        ol, _ = om.forward({k: jnp.asarray(v) for k, v in params.items()},
                           jnp.asarray(x_va))
    prob = 1.0 / (1.0 + np.exp(-np.clip(np.asarray(ol), -40.0, 40.0)))
    pred_on = prob > 0.5
    tp = float(np.sum(pred_on & (o_va > 0.5)))
    prec = tp / max(pred_on.sum(), 1)
    rec = tp / max((o_va > 0.5).sum(), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    print(f"val: onset-map P {prec:.3f} R {rec:.3f} F1 {f1:.3f}")

    # end-to-end: decode the val mixtures
    hits = total = fp = 0
    for audio, events in clips[:n_val]:
        found = om.nn_extract_notes(audio, args.sr, params=params,
                                    min_duration=0.1)
        total += len(events)
        used = set()
        for onset_s, midi in events:
            ok = [i for i, f in enumerate(found)
                  if i not in used and abs(f["onset_s"] - onset_s) < 0.08
                  and abs(f["midi_note"] - midi) <= 1]
            if ok:
                used.add(ok[0])
                hits += 1
        fp += len(found) - len(used)
    print(f"end-to-end: {hits}/{total} notes recovered "
          f"(±80 ms, ±1 semitone), {fp} spurious")

    # spectral-path baseline on the SAME validation mixtures — the
    # number that decides whether the NN earns the pipeline default
    from openwurli_tpu.calib import notes as notes_mod

    s_hits = s_fp = 0
    for audio, events in clips[:n_val]:
        found = notes_mod.extract_notes(audio, args.sr, min_duration=0.1,
                                        method="spectral")
        used = set()
        for onset_s, midi in events:
            ok = [i for i, f in enumerate(found)
                  if i not in used and abs(f["onset_s"] - onset_s) < 0.08
                  and abs(f["midi_note"] - midi) <= 1]
            if ok:
                used.add(ok[0])
                s_hits += 1
        s_fp += len(found) - len(used)
    print(f"spectral baseline: {s_hits}/{total} notes recovered, "
          f"{s_fp} spurious")

    out = args.out or om._DATA
    om.save_params(params, out)
    print(f"→ {out}")


if __name__ == "__main__":
    main()
