#!/usr/bin/env python3
"""TPU microbenchmarks for the fused-kernel design space.

Measures, inside a single Pallas kernel (time loop = fori_loop, state in
VMEM scratch), the per-sample-loop-iteration cost of the primitive
patterns the mono-chain kernel is built from:

  loop     — empty loop body (per-iteration floor)
  chain<D> — D serially-dependent multiply-adds on a (SUB, LAN) block
  wide     — dependency-chain cost vs block width (does width amortise?)
  exp      — transcendental chain
  dot      — small (M,M)@(M,LAN) matmul chain (MNA matvec shape)
  ge       — one 16×16 per-stream Gaussian elimination per iteration

Honest timing: each measurement ends in a device→host transfer of the
kernel output (block_until_ready on the tunneled platform returns early).
Launch overhead is reported separately (measured with iters=1) and
subtracted. Run: python tools/tpu_probe.py [probe ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time_kernel(build, iters, reps=3):
    """build(iters) -> jitted fn(x) -> y. Returns min wall seconds/call."""
    fn = build(iters)
    x = jnp.ones((1,), jnp.float32)
    y = np.asarray(fn(x))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        y = np.asarray(fn(x))
        best = min(best, time.time() - t0)
    return best, float(y.ravel()[0])


def probe_loop_body(make_body, sub, lan, n_state=1, mat=None):
    """Kernel skeleton: fori_loop(iters) over make_body, state in scratch.

    mat: optional (m, m) constant passed as a VMEM input (Pallas kernels
    cannot capture array constants).
    """

    def build(iters):
        def kernel(*refs):
            if mat is not None:
                mat_ref, x_ref, out_ref, *scratch = refs
            else:
                x_ref, out_ref, *scratch = refs
                mat_ref = None
            for s in scratch:
                s[:] = jnp.full(s.shape, x_ref[0], s.dtype)
            body = make_body(scratch, mat_ref)
            jax.lax.fori_loop(jnp.int32(0), jnp.int32(iters),
                              lambda i, c: body(i, c), jnp.float32(0.0))
            out_ref[:] = scratch[0][0:1, 0:128]

        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        args = ()
        if mat is not None:
            in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] + in_specs
            args = (jnp.asarray(mat, jnp.float32),)

        @jax.jit
        def fn(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((sub, lan), jnp.float32)
                                for _ in range(n_state)],
            )(*args, x)

        return fn

    return build


def measure(name, build, iters=20_000, target_s=0.4):
    base, _ = _time_kernel(build, 1)
    # Scale iteration count until the kernel body dwarfs launch jitter.
    full, chk = _time_kernel(build, iters)
    while full - base < target_s and iters < 80_000_000:
        iters = int(iters * max(2, min(32, target_s / max(full - base, 1e-4))))
        full, chk = _time_kernel(build, iters)
    per_iter_us = (full - base) * 1e6 / (iters - 1)
    print(f"{name:34s} launch={base*1e3:7.1f} ms  iters={iters:>9d}  "
          f"per_iter={per_iter_us:9.4f} us  (chk={chk:.3e})")
    return per_iter_us


def main(which):
    with jax.enable_x64(False):
        dev = jax.devices()[0]
        print(f"device: {dev.platform} {getattr(dev,'device_kind','?')}")

        def empty(scratch, _m):
            def body(i, c):
                return c + 1.0
            return body

        def chain(depth):
            def mk(scratch, _m):
                s = scratch[0]

                def body(i, c):
                    v = s[:]
                    for d in range(depth):
                        v = v * 1.0000001 + 0.0000001
                    s[:] = v
                    return c
                return body
            return mk

        def expchain(depth):
            def mk(scratch, _m):
                s = scratch[0]

                def body(i, c):
                    v = s[:]
                    for d in range(depth):
                        v = jnp.exp(v * 1e-6)
                    s[:] = v
                    return c
                return body
            return mk

        def dotchain(depth):
            def mk(scratch, mat_ref):
                s = scratch[0]

                def body(i, c):
                    v = s[:]
                    a = mat_ref[:]
                    for d in range(depth):
                        v = jnp.dot(a, v,
                                    preferred_element_type=jnp.float32)
                    s[:] = v
                    return c
                return body
            return mk

        def ge16(scratch, _m):
            """One per-stream 16×16 GE per iteration, row-major 2D layout:
            aug stored (16*17, LAN); rows are sublane slices."""
            aug0 = scratch[0]
            lan = aug0.shape[-1]

            def body(i, c):
                # rows as a python list of (17, LAN) blocks
                rows = [aug0[17 * k:17 * (k + 1), :] + 0.0 for k in range(16)]
                for k in range(16):
                    piv = rows[k][k:k + 1, :]
                    inv = 1.0 / (piv + 1.0)
                    rk = rows[k] * inv
                    rows[k] = rk
                    for r in range(k + 1, 16):
                        rows[r] = rows[r] - rows[r][k:k + 1, :] * rk
                aug0[:] = jnp.concatenate(rows, axis=0)
                return c
            return body

        def ge16_flat(scratch, _m):
            """GE with the whole augmented system as ONE (16,17*LAN)-ish
            block: columns-of-streams layout, aug (16, 17, LAN) flattened
            to (16, 17*LAN) so every elimination update is one wide op."""
            aug0 = scratch[0]

            def body(i, c):
                aug = aug0[:] + 0.0  # (16, 17*LAN)
                lan = aug.shape[-1] // 17
                for k in range(16):
                    piv = aug[k:k + 1, k * lan:(k + 1) * lan]
                    inv = 1.0 / (piv + 1.0)
                    invt = pltpu.repeat(inv, 17, axis=1)
                    rk = aug[k:k + 1, :] * invt
                    factors = pltpu.repeat(
                        aug[:, k * lan:(k + 1) * lan], 17, axis=1)
                    mask = (jax.lax.broadcasted_iota(
                        jnp.int32, (16, 1), 0) > k).astype(jnp.float32)
                    aug = aug - mask * factors * rk
                aug0[:] = aug
                return c
            return body

        def dynstore(scratch, _m):
            """Dynamic row store per iteration (voice-kernel suspect)."""
            s = scratch[0]
            buf = scratch[1]
            n_rows = buf.shape[0]

            def body(i, c):
                v = s[:] * 1.0000001
                s[:] = v
                buf[pl.ds(jax.lax.rem(i, n_rows), 1), :] = v[0:1, :]
                return c
            return body

        probes = {
            "loop": lambda: measure(
                "empty loop", probe_loop_body(empty, 8, 128)),
            "chain20_8x128": lambda: measure(
                "chain d=20 (8,128)",
                probe_loop_body(chain(20), 8, 128), 5000),
            "chain20_8x1024": lambda: measure(
                "chain d=20 (8,1024)",
                probe_loop_body(chain(20), 8, 1024), 5000),
            "chain20_64x128": lambda: measure(
                "chain d=20 (64,128)",
                probe_loop_body(chain(20), 64, 128), 5000),
            "chain20_128x1024": lambda: measure(
                "chain d=20 (128,1024)",
                probe_loop_body(chain(20), 128, 1024), 2000),
            "chain100_8x128": lambda: measure(
                "chain d=100 (8,128)",
                probe_loop_body(chain(100), 8, 128), 2000),
            "exp20_8x128": lambda: measure(
                "exp chain d=20 (8,128)",
                probe_loop_body(expchain(20), 8, 128), 2000),
            "exp20_16x128": lambda: measure(
                "exp chain d=20 (16,128)",
                probe_loop_body(expchain(20), 16, 128), 2000),
            "dot8_8x128": lambda: measure(
                "dot (8,8)@(8,128) d=10",
                probe_loop_body(dotchain(10), 8, 128,
                                mat=np.eye(8) * 0.999), 2000),
            "dot32_32x128": lambda: measure(
                "dot (32,32)@(32,128) d=10",
                probe_loop_body(dotchain(10), 32, 128,
                                mat=np.eye(32) * 0.999), 2000),
            "dot32_32x1024": lambda: measure(
                "dot (32,32)@(32,1024) d=10",
                probe_loop_body(dotchain(10), 32, 1024,
                                mat=np.eye(32) * 0.999), 2000),
            "ge16_128": lambda: measure(
                "GE 16x16 rows (lan=128)",
                probe_loop_body(ge16, 16 * 17, 128), 500),
            "ge16_1024": lambda: measure(
                "GE 16x16 rows (lan=1024)",
                probe_loop_body(ge16, 16 * 17, 1024), 500),
            "ge16f_128": lambda: measure(
                "GE 16x16 flat (lan=128)",
                probe_loop_body(ge16_flat, 16, 17 * 128), 500),
            "dynstore": lambda: measure(
                "dynamic row store (512,128) buf",
                probe_loop_body(dynstore, 8, 128, n_state=2), 20000),
        }
        for name in (which or probes):
            try:
                probes[name]()
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main(sys.argv[1:])
