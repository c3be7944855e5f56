#!/usr/bin/env python3
"""Recording analysis: note extraction + aggregate statistics.

Rebuild of the reference tools/recording_analyzer.py (librosa-free): note
onset/pitch/isolation extraction plus aggregate stats — tremolo rate,
spectral centroids, decay rates.

    python tools/recording_analyzer.py recording.wav
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def tremolo_rate(audio, sr):
    """Estimate AM rate from the RMS-envelope spectrum (1-12 Hz band)."""
    win = int(sr * 0.02)
    n = len(audio) // win
    env = np.sqrt((audio[: n * win].reshape(n, win) ** 2).mean(axis=1))
    env = env - env.mean()
    if len(env) < 32:
        return float("nan"), 0.0
    spec = np.abs(np.fft.rfft(env * np.hanning(len(env))))
    freqs = np.fft.rfftfreq(len(env), win / sr)
    mask = (freqs >= 1.0) & (freqs <= 12.0)
    if not mask.any():
        return float("nan"), 0.0
    idx = np.argmax(np.where(mask, spec, 0))
    strength = spec[idx] / max(spec.sum(), 1e-12)
    return float(freqs[idx]), float(strength)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("recording")
    p.add_argument("--output", default="")
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("axon"):
        jax.config.update("jax_platforms", "axon,cpu")

    from openwurli_tpu.calib import harmonics, notes as notes_mod
    from openwurli_tpu.io import wav

    audio, sr = wav.read_wav(args.recording)
    if audio.ndim > 1:
        audio = audio.mean(axis=1)

    found = notes_mod.extract_notes(audio, sr)
    scored = notes_mod.score_isolation(found, audio, sr)
    rate, strength = tremolo_rate(audio, sr)

    decays, centroids = [], []
    for n in scored:
        f = harmonics.extract_note_features(
            audio, sr, n["f0_hz"], n["onset_s"],
            n["offset_s"] - n["onset_s"])
        d = harmonics.decay_rate_db_per_s(f["decay_db"], f["decay_times"])
        if np.isfinite(d):
            decays.append((n["midi_note"], d))
        if np.isfinite(f["centroid_sustain_hz"]):
            centroids.append((n["midi_note"],
                              f["centroid_sustain_hz"] / n["f0_hz"]))

    print(f"file: {args.recording} ({len(audio)/sr:.1f}s @ {sr} Hz)")
    print(f"notes: {len(found)} found, {len(scored)} usable")
    tiers = {t: sum(1 for n in scored if n['tier'] == t)
             for t in ('gold', 'silver', 'bronze')}
    print(f"tiers: {tiers}")
    print(f"tremolo: ~{rate:.2f} Hz (strength {strength:.3f})")
    if decays:
        ds = np.asarray([d for _, d in decays])
        print(f"decay rates: median {np.median(ds):.1f} dB/s "
              f"(range {ds.min():.1f}-{ds.max():.1f})")
    if centroids:
        cs = np.asarray([c for _, c in centroids])
        print(f"centroid/f0: median {np.median(cs):.2f}")

    if args.output:
        json.dump({
            "notes": scored, "tremolo_rate_hz": rate,
            "decays": decays, "centroid_ratios": centroids,
        }, open(args.output, "w"), indent=1)
        print(f"→ {args.output}")


if __name__ == "__main__":
    main()
