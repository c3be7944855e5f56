#!/usr/bin/env python3
"""Headline benchmark: 64-voice full-chain render throughput per chip.

Renders B independent streams, each sounding a 64-voice chromatic
fortissimo chord, through the COMPLETE analog chain on the fused Pallas
kernels: voice bank (reed + attack noise + pickup, kernels/voice_bank.py)
→ per-stream sum → mono chain (2× oversampled Twin-T tremolo → twin
Sherman-Morrison DK preamp → 21-dim Gummel-Poon Class AB power amp →
speaker, kernels/mono_chain.py). Reports the aggregate real-time factor
B × rendered_seconds / wall_seconds.

Honest timing: the chain is warmed 0.6 s before the timed window
(engine.rs warm_up), each timed repetition re-renders voices AND chain,
and timing is terminated by a device→host transfer of a scalar checksum
that consumes every output (full-audio transfers over the tunneled
device measure network bandwidth, not compute; block_until_ready alone
returns early on this platform).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference's own best published full-chain polyphonic
number (render-poly, 6 notes × 10 s in 1.13 s ≈ 53× realtime, reference
CHANGELOG.md:111) — our per-stream workload (64 sounding voices) is
strictly heavier.

Env knobs: BENCH_STREAMS (128), BENCH_SECONDS (~1), BENCH_REPS (3),
BENCH_SAMPLE_RATE (44100).
"""

import json
import os
import sys
import time

import jax


def _setup_platforms():
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        jax.config.update("jax_platforms", plats + ",cpu")


def _run_fused(streams, sr, reps):
    import jax.numpy as jnp
    import numpy as np

    from openwurli_tpu.kernels import mono_chain as mc
    from openwurli_tpu.kernels import voice_bank as vb

    n_voices = 64
    t_blk = 43 * 1024  # one ~1 s block, multiple of the kernel tile
    seconds = t_blk / sr

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        mc.pack_consts(sr)
        # Voice-major lane order (lane = voice*streams + stream): the
        # per-stream sum then reduces over a NON-minor axis, which XLA
        # lowers without a layout copy of the (T, V) voices array — the
        # stream-major order forced a full-size HLO temp copy that OOMed
        # HBM at 1024 streams (2 x 10.75 GB).
        notes = np.repeat(np.arange(36, 36 + n_voices, dtype=np.float64),
                          streams)
        vels = np.clip(
            0.95 + 0.0005 * np.tile(np.arange(streams), n_voices), 0, 1)
        params, _ = vb.make_kernel_params(notes, vels, sr,
                                          lanes=n_voices * streams)
        ctrl = mc.make_controls(sr, streams, volume=0.5, depth=0.5,
                                character=0.0)
        state = mc.init_state(sr, streams)

    params = jnp.asarray(params)
    ctrl = jnp.asarray(ctrl)
    state = jnp.asarray(state)

    # Voice renders go chunk-by-chunk (<= 8192 lanes, the voice kernel's
    # own VMEM chunk size), each chunk summed into the (T, streams)
    # audio straight away, so the full (T, V) voices array is NEVER
    # materialized in HBM (10.75 GB + a concat/copy target at 1024
    # streams — OOM). The per-chunk sum is slice-adds over lane-aligned
    # minor-dim blocks (streams % 128 == 0): reshape-based reductions
    # force a full-size tiled-layout copy.
    lanes = n_voices * streams
    chunk = min(8192, lanes)
    nv_chunk = chunk // streams

    @jax.jit
    def _sum_chunk(v):
        acc = v[:, 0:streams]
        for m in range(1, nv_chunk):
            acc = acc + v[:, m * streams:(m + 1) * streams]
        return acc
    checksum = jax.jit(lambda y, s: jnp.sum(y) + jnp.sum(jnp.abs(s)))

    steady = vb.steady_limits(params)

    # The mono-chain kernel's default 1024-sample tile overflows VMEM at
    # >=1024 streams (4 MB audio-in + 4 MB out tiles); 256 compiles and
    # measures within noise of 1024 at lower widths.
    mc_tile = 256 if streams >= 1024 else mc.T_TILE

    def block(state):
        audio = None
        for i0 in range(0, lanes, chunk):
            v = vb.render_voice_bank(params[..., i0:i0 + chunk], t_blk,
                                     steady=steady, events=False)
            part = _sum_chunk(v)
            audio = part if audio is None else audio + part
        out, state = mc.render_tpu(sr, ctrl, state, audio, t_tile=mc_tile)
        return out, state

    # Warm-up: compile + settle the chain ~0.6 s before the timed window.
    t0 = time.time()
    out, state = block(state)
    _ = float(checksum(out, state))
    compile_s = time.time() - t0
    peak = float(jnp.max(jnp.abs(out)))
    finite = bool(jnp.isfinite(out).all())
    assert finite, "bench render produced non-finite audio"

    best = float("inf")
    for _ in range(reps):
        t1 = time.time()
        out, state = block(state)
        _ = float(checksum(out, state))  # scalar transfer ends the timing
        best = min(best, time.time() - t1)

    rtf = streams * seconds / best
    return rtf, best, compile_s, peak


def _wait_device_healthy(max_wait_s=300):
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
            time.sleep(20)


def main():
    _setup_platforms()
    sr = float(os.environ.get("BENCH_SAMPLE_RATE", "44100"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    # Safest-first ladder; the best surviving config is reported.
    # Throughput saturates around 256-512 streams (~330x aggregate).
    if "BENCH_STREAMS" in os.environ:
        ladder = [int(os.environ["BENCH_STREAMS"])]
    else:
        ladder = [128, 256, 512, 1024]

    best = None
    last_err = None
    for streams in ladder:
        if not _wait_device_healthy():
            print("# device unhealthy; stopping ladder", file=sys.stderr)
            break
        try:
            rtf, wall, compile_s, peak = _run_fused(streams, sr, reps)
            print(f"# streams={streams} wall={wall:.3f}s "
                  f"compile={compile_s:.0f}s per_stream="
                  f"{rtf/streams:.2f}x peak={peak:.4f}", file=sys.stderr)
            if best is None or rtf > best[0]:
                best = (rtf, streams)
        except Exception as e:
            last_err = e
            print(f"# streams={streams} failed: {type(e).__name__}: "
                  f"{str(e)[:160]}", file=sys.stderr)
    if best is None:
        raise SystemExit(f"all bench configs failed: {last_err}")

    rtf, streams = best
    reference_rtf = 53.0  # render-poly, reference CHANGELOG.md:111
    print(json.dumps({
        "metric": "64-voice full-chain render throughput per chip",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / reference_rtf, 2),
    }))


if __name__ == "__main__":
    main()
