#!/usr/bin/env python3
"""Sustained realtime factor of the interactive path over the tunnel.

Simulates a live session on FastEngine: precompile, then render a
multi-minute stream in audio-callback-sized chunks with notes arriving
continuously, measuring sustained throughput and worst-case block
latency. The round-4 finding was ~100 ms per 23 ms block (eager
dispatch); round 5 fuses each block into ONE compiled program and adds
`lookahead` pipelining (dispatch block N+1 before blocking on N's
transfer).

    python tools/interactive_rtf.py --seconds 120 --lookahead 1
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=120.0)
    p.add_argument("--sr", type=float, default=44100.0)
    p.add_argument("--chunk", type=int, default=1024,
                   help="render() request size (audio-callback block)")
    p.add_argument("--lookahead", type=int, default=1)
    p.add_argument("--notes-per-s", type=float, default=3.0)
    args = p.parse_args()

    import numpy as np

    from openwurli_tpu.fast_engine import FastEngine

    eng = FastEngine(args.sr, lookahead=args.lookahead)
    t0 = time.time()
    eng.precompile()
    print(f"# precompile {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    total = int(args.seconds * args.sr)
    chunk = args.chunk
    note_period = int(args.sr / args.notes_per_s)
    ring = []
    pos = 0
    walls = []
    peak = 0.0
    t_start = time.time()
    next_note = 0
    while pos < total:
        if pos >= next_note:
            note = int(rng.integers(40, 90))
            vel = float(rng.uniform(0.4, 1.0))
            off = int(rng.integers(0, chunk))
            eng.note_on(note, vel, offset=off)
            ring.append((note, pos))
            if len(ring) > 8:
                old, _ = ring.pop(0)
                eng.note_off(old)
            next_note += note_period
        t1 = time.time()
        out = eng.render(chunk)
        walls.append(time.time() - t1)
        peak = max(peak, float(np.abs(out).max()))
        assert np.isfinite(out).all()
        pos += chunk
    wall = time.time() - t_start
    walls = np.asarray(walls)
    chunk_s = chunk / args.sr
    rtf = args.seconds / wall
    over = float((walls > chunk_s).mean())
    print(f"rendered {args.seconds:.0f}s in {wall:.1f}s — sustained "
          f"{rtf:.2f}x realtime (chunk {chunk_s * 1e3:.1f} ms; "
          f"p50 {np.percentile(walls, 50) * 1e3:.1f} ms, "
          f"p99 {np.percentile(walls, 99) * 1e3:.1f} ms, "
          f"max {walls.max() * 1e3:.0f} ms; "
          f"{over * 100:.1f}% of chunks over budget; peak {peak:.3f})",
          flush=True)


if __name__ == "__main__":
    main()
