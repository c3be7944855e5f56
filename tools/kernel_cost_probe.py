#!/usr/bin/env python3
"""Dissect the fused mono-chain kernel's on-device cost.

Times render_tpu at a fixed (S, T) across configurations: power-amp NR
iteration count, stage knockouts (tremolo / preamp / power amp / speaker /
oversampler), to locate where the per-sample budget goes. Each config
clears jit caches so the module-level knockout flags re-trace.

    python tools/kernel_cost_probe.py --streams 128 --samples 8192
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--streams", type=int, default=128)
    p.add_argument("--samples", type=int, default=8192)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--sr", type=float, default=44100.0)
    p.add_argument("--configs", default="")
    args = p.parse_args()

    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        jax.config.update("jax_platforms", plats + ",cpu")

    import jax.numpy as jnp
    import numpy as np

    from openwurli_tpu.kernels import mono_chain as mc

    sr = args.sr
    S = args.streams
    T = args.samples
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        mc.pack_consts(sr)
        ctrl = mc.make_controls(sr, S, volume=0.5, depth=0.5)
        state0 = mc.init_state(sr, S)
        rng = np.random.default_rng(0)
        audio = (0.05 * rng.standard_normal((T, S))).astype(np.float32)

    ctrl = jnp.asarray(ctrl)
    audio = jnp.asarray(audio)

    def timed(tag):
        state = jnp.asarray(state0)
        t0 = time.time()
        out, st = mc.render_tpu(sr, ctrl, state, audio)
        chk = float(jnp.sum(out))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.reps):
            t1 = time.time()
            out, st2 = mc.render_tpu(sr, ctrl, state, audio)
            chk = float(jnp.sum(out) + jnp.sum(st2))
            best = min(best, time.time() - t1)
        us = best / T * 1e6
        print(f"{tag:28s} wall={best:7.3f}s  {us:8.2f} us/sample  "
              f"compile={compile_s:5.1f}s chk={chk:.3e}", flush=True)
        return best

    configs = [
        ("baseline", {}),
        ("pa_iters=6", {"N_PA_ITERS": 6}),
        ("pa_iters=4", {"N_PA_ITERS": 4}),
        ("pa_iters=2", {"N_PA_ITERS": 2}),
        ("pa_iters=0(off)", {"ENABLE_PA": False}),
        ("pre_off", {"ENABLE_PRE": False}),
        ("trem_off", {"ENABLE_TREM": False}),
        ("spk+os_off", {"ENABLE_SPK": False, "ENABLE_OS": False}),
        ("all_off(loop floor)", {"ENABLE_PA": False, "ENABLE_PRE": False,
                                 "ENABLE_TREM": False, "ENABLE_SPK": False,
                                 "ENABLE_OS": False}),
    ]
    if args.configs:
        want = set(args.configs.split(","))
        configs = [c for c in configs if c[0] in want]

    defaults = {k: getattr(mc, k) for k in
                ("N_PA_ITERS", "PA_REFRESH_ITERS", "ENABLE_PA", "ENABLE_PRE",
                 "ENABLE_TREM", "ENABLE_SPK", "ENABLE_OS")}
    for tag, over in configs:
        for k, v in defaults.items():
            setattr(mc, k, v)
        for k, v in over.items():
            setattr(mc, k, v)
        if "N_PA_ITERS" in over:
            mc.PA_REFRESH_ITERS = tuple(range(over["N_PA_ITERS"]))
        jax.clear_caches()
        try:
            timed(tag)
        except Exception as e:
            print(f"{tag:28s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
    for k, v in defaults.items():
        setattr(mc, k, v)


if __name__ == "__main__":
    main()
