#!/usr/bin/env python3
"""Summarise calibrate / sensitivity CSVs (reference tools/analyze_calibration.py).

    python tools/analyze_calibration.py /tmp/calibrate.csv
"""

import argparse
import csv
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("csv_path")
    p.add_argument("--target-db", type=float, default=-41.9,
                   help="reference t5_rms level (C4 anchor)")
    args = p.parse_args()

    rows = list(csv.DictReader(open(args.csv_path)))
    if not rows:
        print("empty CSV")
        return

    by_vel = {}
    for r in rows:
        by_vel.setdefault(r["velocity"], []).append(r)

    for vel, group in sorted(by_vel.items(), key=lambda kv: int(kv[0])):
        t5 = np.asarray([float(r["t5_rms_db"]) for r in group])
        h2 = np.asarray([float(r["t2_h2_h1_db"]) for r in group])
        y = np.asarray([float(r["y_peak"]) for r in group])
        print(f"velocity {vel}:")
        print(f"  t5_rms: mean {t5.mean():6.1f} dB  spread "
              f"{t5.max()-t5.min():4.1f} dB  (keyboard balance)")
        print(f"  pickup H2/H1: {h2.min():6.1f} .. {h2.max():6.1f} dB")
        print(f"  y_peak: max {y.max():.3f} "
              f"{'⚠ near pickup pole' if y.max() > 0.95 else ''}")
        # Suggested register trim deltas vs C4 at this velocity
        mid = [r for r in group if r["midi"] == "60"]
        if mid and vel == "127":
            anchor = float(mid[0]["t5_rms_db"])
            worst = max(group, key=lambda r: abs(float(r["t5_rms_db"]) - anchor))
            print(f"  worst imbalance vs C4: MIDI {worst['midi']} "
                  f"({float(worst['t5_rms_db']) - anchor:+.1f} dB)")


if __name__ == "__main__":
    main()
