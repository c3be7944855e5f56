#!/usr/bin/env python3
"""Headline benchmark: 64-voice full-chain real-time factor per chip.

Renders B independent WurliEngine instances — each sustaining the canonical
worst-case 6-note chord across 64 voice slots with the complete analog
chain (2× oversampled Twin-T tremolo → 8-node DK preamp with twin
main/shadow solve → Class AB power-amp circuit solve → speaker) — as one
batched scan on the accelerator, and reports the aggregate real-time
factor: (B × rendered_seconds) / wall_seconds.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the reference implementation's own full-chain
polyphonic render throughput (~53× realtime for render-poly, reference
CHANGELOG.md:111, unspecified dev machine).

Env knobs: BENCH_STREAMS (default 32), BENCH_SECONDS (default 0.25),
BENCH_SAMPLE_RATE (default 44100).
"""

import json
import os
import sys
import time

import jax


def _setup_platforms():
    """Keep the session's accelerator, add a local CPU for eager setup."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        jax.config.update("jax_platforms", plats + ",cpu")
    # NOTE: the jax persistent compilation cache is deliberately NOT
    # enabled — with the axon remote-compile flow it stalled executions
    # (observed: futex wait with no progress past the 15-minute mark).


def _run_config(streams, seconds, reps, sr):
    """One honest measurement. Returns (rtf, wall, compile_s, peak)."""
    import jax.numpy as jnp
    import numpy as np

    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    block = int(sr * seconds)

    # Build engine + chord state on the local CPU (eager ops over a remote
    # accelerator tunnel are latency-bound; setup is hundreds of small ops).
    with jax.default_device(cpu):
        from openwurli_tpu import engine

        eng = engine.Engine(sr)
        for note in (48, 55, 60, 63, 67, 70):
            eng.note_on(note, 0.95)
        state = eng.state

    state = jax.device_put(state, accel)
    if streams > 1:
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (streams,)
                                       + jnp.asarray(x).shape), state)
        vrender = jax.jit(jax.vmap(lambda s: engine._render(eng, s, block)))
    else:
        stacked = state
        vrender = jax.jit(lambda s: engine._render(eng, s, block))

    t0 = time.time()
    stacked2, out = vrender(stacked)
    _ = np.asarray(out)  # host transfer forces completion
    compile_s = time.time() - t0

    # Timing ends with a device→host transfer of the audio —
    # block_until_ready alone is not trustworthy on the experimental axon
    # platform (returns before execution ends).
    st = stacked2
    t0 = time.time()
    for _ in range(reps):
        st, out = vrender(st)
    out_host = np.asarray(out)
    wall = time.time() - t0

    peak = float(np.abs(out_host).max())
    assert np.isfinite(out_host).all(), "bench render broken"
    return reps * streams * seconds / wall, wall, compile_s, peak


def _wait_device_healthy(max_wait_s=420):
    """Trivial-op probe loop: the tunneled worker takes minutes to restart
    after a kernel fault."""
    import numpy as np
    import jax.numpy as jnp

    deadline = time.time() + max_wait_s
    while True:
        try:
            np.asarray(jax.jit(lambda a: a + 1.0)(jnp.ones((4,))))
            return True
        except Exception:
            if time.time() > deadline:
                return False
            time.sleep(30)


def main():
    _setup_platforms()

    sr = float(os.environ.get("BENCH_SAMPLE_RATE", "44100"))
    # Resilience ladder, SAFEST FIRST: vmapped engine executables
    # intermittently crash the tunneled TPU worker, and a crashed worker
    # can stay down — so bank a robust single-stream measurement before
    # attempting the batched configurations, and report the best success.
    ladder = [
        (1, 0.05, 1),  # non-vmapped single stream (most robust)
        (8, 0.1, 1),
        (int(os.environ.get("BENCH_STREAMS", "32")),
         float(os.environ.get("BENCH_SECONDS", "0.25")),
         int(os.environ.get("BENCH_REPS", "2"))),
    ]
    best = None
    last_err = None
    for streams, seconds, reps in ladder:
        if not _wait_device_healthy():
            print("# device unhealthy; stopping ladder", file=sys.stderr)
            break
        try:
            rtf, wall, compile_s, peak = _run_config(streams, seconds,
                                                     reps, sr)
            cfg = (streams, seconds, reps, wall, compile_s, peak)
            if best is None or rtf > best[0]:
                best = (rtf, cfg)
        except Exception as e:  # worker crash / device fault
            last_err = e
            print(f"# config ({streams},{seconds},{reps}) failed: "
                  f"{type(e).__name__}: {str(e)[:120]}", file=sys.stderr)
    if best is None:
        raise SystemExit(f"all bench configs failed: {last_err}")

    rtf, (streams, seconds, reps, wall, compile_s, peak) = best
    reference_rtf = 53.0  # render-poly 6 notes × 10 s → 1.13 s (CHANGELOG)
    print(json.dumps({
        "metric": "64-voice full-chain render throughput per chip",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / reference_rtf, 4),
    }))
    print(f"# streams={streams} seconds={seconds} reps={reps} "
          f"wall={wall:.3f}s compile={compile_s:.0f}s "
          f"per_stream={rtf/streams:.2f}x peak={peak:.4f}", file=sys.stderr)


if __name__ == "__main__":
    main()
