#!/usr/bin/env python3
"""Time the fused voice-bank kernel at production shapes.

Reports ns per lane-sample for the plain (sustained) and events paths —
the number docs/tpu-architecture.md's roofline tracks (ALU floor is
~0.05 ns/lane-sample; round 5 measures 0.145 plain / 0.195 events as
ONE fused program — the rounds-3/4 "0.5-0.9" readings were dominated
by per-call eager-dispatch overhead over the tunnel, ~0.23 s/call at
8192 lanes).

    python tools/vb_probe.py --lanes 8192 --samples 88064
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lanes", type=int, default=8192)
    p.add_argument("--samples", type=int, default=44032)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--sr", type=float, default=44100.0)
    p.add_argument("--events", action="store_true",
                   help="also time the events path")
    p.add_argument("--ko", default="",
                   help="comma list of VB_KO knockout levels to time "
                        "(plain path only), e.g. 0,1,2,3,4")
    args = p.parse_args()

    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        jax.config.update("jax_platforms", plats + ",cpu")

    import jax.numpy as jnp
    import numpy as np

    from openwurli_tpu.kernels import voice_bank as vb

    lanes, total, sr = args.lanes, args.samples, args.sr
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        notes = np.linspace(36.0, 96.0, lanes)
        vels = np.clip(0.6 + 0.4 * np.linspace(0, 1, lanes), 0, 1)
        params, _ = vb.make_kernel_params(notes, vels, sr, lanes=lanes)
        rel = np.full(lanes, 0.6 * total)
        params_ev, _ = vb.make_kernel_params(
            notes, vels, sr, lanes=lanes,
            onsets=np.zeros(lanes), releases=rel)

    def timed(tag, pp, events):
        pp_np = np.asarray(pp)
        steady = vb.steady_limits(pp_np)
        min_rel = vb._min_release(pp_np)
        ppd = jnp.asarray(pp)

        # ONE jitted program per timed call (kernel + checksum): eager
        # per-call ops (state init, chunk slicing) each cost a ~27 ms
        # tunnel dispatch — round 4 measured ~0.23 s/call of pure
        # dispatch overhead at 8192 lanes, dwarfing the kernel.
        @jax.jit
        def prog():
            out = vb.render_voice_bank(ppd, total, steady=steady,
                                       events=events,
                                       min_release=min_rel)
            return jnp.sum(out)

        def run():
            return float(prog())

        t0 = time.time()
        chk = run()
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.reps):
            t1 = time.time()
            chk = run()
            best = min(best, time.time() - t1)
        ns = best / (lanes * total) * 1e9
        print(f"{tag:12s} wall={best:6.3f}s  {ns:6.3f} ns/lane-sample  "
              f"compile={compile_s:5.1f}s chk={chk:.6e}", flush=True)

    if args.ko:
        for lvl_s in args.ko.split(","):
            vb.VB_KO = int(lvl_s)
            jax.clear_caches()
            timed(f"plain ko={lvl_s}", params, False)
        vb.VB_KO = 0
        jax.clear_caches()
        return

    timed("plain", params, False)
    if args.events:
        timed("events", params_ev, True)


if __name__ == "__main__":
    main()
