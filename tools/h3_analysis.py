#!/usr/bin/env python3
"""Offline H3-deficit analysis with SNR filtering.

Rebuild of the reference ml/h3_analysis_v2.py: for each usable note in the
harmonics dataset (or a live model render sweep), compare H3/H1 between
real and model with inter-harmonic SNR gating, and report the per-register
H3 deficit that the MLP's decay/frequency corrections are expected to fix.

    python tools/h3_analysis.py --data-dir ml_data
    python tools/h3_analysis.py --model-sweep   # model-only H3 profile
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SNR_THRESHOLD_DB = 10.0


def model_sweep(notes, velocity=0.8, seconds=1.5, sr=44100.0):
    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("axon"):
        jax.config.update("jax_platforms", "axon,cpu")
    import jax.numpy as jnp

    from openwurli_tpu import voice
    from openwurli_tpu.calib import harmonics

    midis = jnp.asarray(notes, dtype=jnp.float64)
    vels = jnp.full(midis.shape, velocity)
    audio = np.asarray(voice.render_note(midis, vels, seconds, sr,
                                         mlp_enabled=False))
    rows = []
    for k, midi in enumerate(notes):
        f = harmonics.extract_note_features(
            audio[:, k], sr, 440.0 * 2 ** ((midi - 69) / 12))
        es = f["windows"]["early_sustain"]
        rows.append((midi, es[2] - es[0] if np.isfinite(es[2]) else None))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="ml_data")
    p.add_argument("--model-sweep", action="store_true")
    args = p.parse_args()

    if args.model_sweep:
        print("midi,h3_h1_db (model DI path, v=0.8)")
        for midi, h3 in model_sweep(list(range(48, 97, 4))):
            print(f"{midi},{'' if h3 is None else f'{h3:.2f}'}")
        return

    path = os.path.join(args.data_dir, "harmonics.json")
    if not os.path.exists(path):
        print(f"{path} not found — run the pipeline through stage 3, or "
              f"use --model-sweep")
        return
    feats = json.load(open(path))
    deficits = []
    for n in feats:
        snr = n.get("snr_db", [99] * 8)
        if len(snr) > 2 and snr[2] < SNR_THRESHOLD_DB:
            continue  # H3 noise-contaminated
        es = n["features"]["windows"]["early_sustain"]
        if not (np.isfinite(es[0]) and np.isfinite(es[2])):
            continue
        deficits.append((n["midi_note"], es[2] - es[0], n["tier"]))
    if not deficits:
        print("no usable H3 observations")
        return
    print("midi,h3_h1_db,tier")
    for midi, d, tier in sorted(deficits):
        print(f"{midi},{d:.2f},{tier}")
    vals = np.asarray([d for _, d, _ in deficits])
    print(f"# n={len(vals)} median={np.median(vals):.2f} dB "
          f"mean={vals.mean():.2f} dB", file=sys.stderr)


if __name__ == "__main__":
    main()
