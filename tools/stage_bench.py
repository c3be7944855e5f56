#!/usr/bin/env python3
"""Per-stage per-sample cost of the XLA (f64) path — scan microbenchmark.

Round-1 measured (batch 32, tunneled v5e): voices 44 µs, preamp twin
75 µs, tremolo 587 µs, power amp 2048 µs per sample. The power-amp cost
was dominated by two jax.jvp re-traces of the Gummel-Poon current
function per Newton iteration; circuits/gp.py's closed-form derivatives
plus pnjlim convergence replace that. Run to quantify:

    python tools/stage_bench.py --batch 32 --samples 2000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--samples", type=int, default=2000)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        jax.config.update("jax_platforms", plats + ",cpu")

    import jax.numpy as jnp
    import numpy as np

    cpu = jax.devices("cpu")[0]
    b = args.batch
    n = args.samples
    with jax.default_device(cpu):
        from openwurli_tpu import voice
        from openwurli_tpu.circuits import (dk_preamp as dk,
                                            power_amp as pa,
                                            tremolo as tr)

        sr = 88_200.0
        notes = jnp.linspace(40.0, 90.0, b)
        vels = jnp.full((b,), 0.8)
        vp, det = voice.note_on_params(notes, vels, 44100.0)
        vst = voice.init_state(vp, det, vels, 44100.0,
                               voice.default_note_seed(notes))
        ppp = dk.make_params(sr)
        pre0 = dk.init_state(ppp, (b,))
        tpp = tr.make_params(sr)
        trem0 = tr.init_state(sr, (b,))
        pap = pa.make_params(sr)
        pa0 = pa.init_state(pap, (b,))
        xs = jnp.asarray(
            0.05 * np.sin(2 * np.pi * 1000 * np.arange(n) / sr)
            * np.ones((b, 1))).T

    g = dk.ldr_conductance(jnp.full((b,), 50_000.0))

    def scan(fn, st, xs_):
        @jax.jit
        def run(st, xs_):
            return jax.lax.scan(fn, st, xs_)

        out = run(st, xs_)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            o = run(st, xs_)
            _ = float(jnp.sum(o[1]))  # scalar checksum transfer
            best = min(best, time.time() - t0)
        return best / n * 1e6

    stages = {
        "voices": (lambda st, x: voice.step(vp, st)[0:2], vst, xs),
        "preamp twin": (lambda st, x: dk.step(ppp, st, g, x), pre0, xs),
        "tremolo": (lambda st, x: tr.step(tpp, st, 0.5), trem0, xs),
        "power amp": (lambda st, x: pa.step(pap, st, x, rail_sag=True),
                      pa0, xs),
    }
    print(f"batch={b} samples={n} (us per sample, best of {args.reps})")
    for name, (fn, st, xs_) in stages.items():
        try:
            us = scan(fn, st, xs_)
            print(f"  {name:12s} {us:9.1f} us/sample")
        except Exception as e:
            print(f"  {name:12s} FAILED {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()
