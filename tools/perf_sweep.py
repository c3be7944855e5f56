#!/usr/bin/env python3
"""Throughput sweep over stream counts (one process, amortised compiles).

Measures the full-chain engine render at several batch sizes with honest
device→host-transfer timing, printing a CSV of aggregate RTF. Use to pick
BENCH_STREAMS and to see where the VPU saturates.

    python tools/perf_sweep.py --streams 8,32,128 --seconds 0.25
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--streams", default="8,32,128")
    p.add_argument("--seconds", type=float, default=0.25)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--sr", type=float, default=44100.0)
    args = p.parse_args()

    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        jax.config.update("jax_platforms", plats + ",cpu")

    import jax.numpy as jnp
    import numpy as np

    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    with jax.default_device(cpu):
        from openwurli_tpu import engine

        eng = engine.Engine(args.sr)
        for note in (48, 55, 60, 63, 67, 70):
            eng.note_on(note, 0.95)
    base = jax.device_put(eng.state, accel)
    block = int(args.sr * args.seconds)

    print("streams,compile_s,wall_s,per_stream_rtf,aggregate_rtf")
    for b in [int(x) for x in args.streams.split(",")]:
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (b,)
                                       + jnp.asarray(x).shape), base)
        vrender = jax.jit(jax.vmap(lambda s: engine._render(eng, s, block)))
        t0 = time.time()
        st, out = vrender(stacked)
        np.asarray(out)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.reps):
            st, out = vrender(st)
        np.asarray(out)
        wall = time.time() - t0
        rtf = args.reps * b * args.seconds / wall
        print(f"{b},{compile_s:.0f},{wall:.3f},{rtf/b:.1f},{rtf:.1f}",
              flush=True)


if __name__ == "__main__":
    main()
