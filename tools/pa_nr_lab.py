#!/usr/bin/env python3
"""Power-amp NR scheme laboratory (CPU).

The fused kernel's power-amp stage spends 8 full Newton iterations
(Gummel-Poon eval + 16-column Jacobian assembly + 16x16 per-stream GE)
per oversampled sample — 86 % of the mono-chain cost. Median samples
converge in ~2 iterations; the cost is set by a ~0.1 % tail of class-AB
crossover handoffs (a Sziklai junction turning on walks ~0.6 V through
pnjlim) and clip-edge slews.

This lab replays the kernel's exact f32 step arithmetic under
configurable iteration schedules — 'F' full Newton, 'D' cheap diagonal
(Jacobi) sweep, 'C' chord re-solve with the last factors — and scores
each scheme's OUTPUT error against a 24-full-iteration truth, per drive
level. Run:

    JAX_PLATFORMS=cpu python tools/pa_nr_lab.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from openwurli_tpu.kernels import mono_chain as mc
from openwurli_tpu.circuits import gp


def pa_step_scheme(c, sc, st, x, scheme):
    """mono_chain.pa_step with a configurable iteration schedule.

    scheme: string over {'F','D','C'}. Returns (st, out_dev) where
    out_dev is the raw output-node deviation (before HEADROOM norm).
    """
    _col = mc._col
    nvcols = c["pa_nvcols"]
    corr0 = _col(nvcols, 3)
    i_dc = _col(nvcols, 4)
    vnl_dc = _col(nvcols, 5)
    sni_out = _col(nvcols, 6)
    gpp = mc._gp_dict(c["pa_gp"], 8)
    K = c["pa_K"]
    # Diagonal entries K[j, j%8], K[j, j%8+8] for the Jacobi sweep
    Kn = np.asarray(K)
    kd1 = jnp.asarray(Kn[np.arange(16), np.arange(16) % 8][:, None])
    kd2 = jnp.asarray(Kn[np.arange(16), np.arange(16) % 8 + 8][:, None])

    big = jnp.dot(c["pa_P"], jnp.concatenate([st["pa_z"], st["pa_di"]],
                                             axis=0),
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    z_new = big[0:21] + _col(c["pa_cols"], 0) * x
    p_dev = big[21:37] + _col(nvcols, 0) * x

    clamp = _col(nvcols, 7)
    nvt_col = _col(nvcols, 8)
    vcrit_col = _col(nvcols, 9)
    ws_clamp = jnp.concatenate(
        [jnp.full_like(st["pa_vnl"][0:8], 0.02),
         jnp.full_like(st["pa_vnl"][8:16], 2.0)], axis=0)
    ws = st["pa_vnl"] + jnp.clip(st["pa_vnl"] - st["pa_vnl_prev"],
                                 -ws_clamp, ws_clamp)
    ws = mc._pnjlim(st["pa_vnl"], ws, nvt_col, vcrit_col)
    vnl = ws

    def resid_from(v, i_):
        return ((v - vnl_dc) - p_dev - corr0
                - jnp.dot(K, i_ - i_dc,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST))

    factors = None
    for op in scheme:
        vbe, vbc = vnl[0:8], vnl[8:16]
        ib, ic, gbb, gbc, gcb, gcc = gp.bjt_currents_derivs_packed(
            gpp, vbe, vbc)
        i_abs = jnp.concatenate([ib, ic], axis=0)
        f = resid_from(vnl, i_abs)
        if op == "F" or (op == "C" and factors is None):
            cols = []
            for j in range(16):
                b = j % 8
                g1 = (gbb if j < 8 else gbc)[b:b + 1, :]
                g2 = (gcb if j < 8 else gcc)[b:b + 1, :]
                cols.append(_col(c["eye16"], j)
                            - _col(K, b) * g1 - _col(K, b + 8) * g2)
            dv_raw, factors = mc._ge_factor(cols, f, 16)
        elif op == "C":
            dv_raw = mc._ge_resolve(factors, f, 16)
        elif op == "D":
            g1 = jnp.concatenate([gbb, gbc], axis=0)   # (16,S): per-port
            g2 = jnp.concatenate([gcb, gcc], axis=0)
            jdiag = 1.0 - kd1 * g1 - kd2 * g2
            dv_raw = f / jnp.where(jnp.abs(jdiag) > 1e-20, jdiag, 1e-20)
        dv = jnp.clip(dv_raw, -clamp, clamp)
        fn = jnp.max(jnp.abs(f), axis=0, keepdims=True)
        dv = jnp.where(fn < mc.PA_CONV_TOL, 0.0, dv)
        vnl = mc._pnjlim(vnl, vnl - dv, nvt_col, vcrit_col)

    ib, ic = gp.bjt_currents_packed(gpp, vnl[0:8], vnl[8:16])
    i_abs = jnp.concatenate([ib, ic], axis=0)
    f = resid_from(vnl, i_abs)
    fn_final = jnp.max(jnp.abs(f), axis=0)
    di_new = i_abs - i_dc
    out_dev = (z_new[sc["pa_out_idx"]:sc["pa_out_idx"] + 1]
               + jnp.sum(sni_out * di_new, axis=0, keepdims=True))
    st = dict(st)
    st["pa_z"] = z_new
    st["pa_di"] = di_new
    st["pa_vnl_prev"] = st["pa_vnl"]
    st["pa_vnl"] = vnl
    return st, (out_dev, fn_final)


def run_scheme(c, sc, state0, xs, scheme):
    names = [n for n, _ in mc.STATE_SPEC]

    def body(carry, x):
        st = dict(zip(names, carry))
        st, out = pa_step_scheme(c, sc, st, x[None, :], scheme)
        return tuple(st[n] for n in names), out

    with jax.enable_x64(False):
        carry0 = tuple(jnp.asarray(state0[n], jnp.float32) for n in names)
        _, (outs, fns) = jax.lax.scan(jax.jit(body), carry0,
                                      jnp.asarray(xs))
    return np.asarray(outs)[:, 0, :], np.asarray(fns)


def cost_eq(scheme):
    """Rough cost in full-iteration equivalents (GE factor = 1.0)."""
    w = {"F": 1.0, "C": 0.45, "D": 0.22}
    return sum(w[op] for op in scheme)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=4096)
    p.add_argument("--schemes", default="")
    args = p.parse_args()

    sr = 44100.0
    consts = mc.pack_consts(sr)
    amps = np.array([0.05, 0.1, 0.2, 0.4])
    S = len(amps)
    ctrl = mc.make_controls(sr, S, volume=0.5, depth=0.5)
    state = mc.init_state(sr, S)
    c, sc = mc._merged_consts(consts, ctrl)
    st0 = mc.unpack_state(jnp.asarray(state))

    T = args.samples
    t = np.arange(T) / (2 * sr)
    xs = (amps[None, :] * np.sin(2 * np.pi * 1000.0 * t)[:, None]
          ).astype(np.float32)

    truth, _ = run_scheme(c, sc, st0, xs, "F" * 24)
    truth = truth[256:]
    peak = np.abs(truth).max(axis=0)

    schemes = ["F" * 8, "F" * 7, "F" * 6, "F" * 5, "F" * 4,
               "DFFFF", "DDFFF", "DFDFF", "DFFDF", "FDFDF",
               "DDFFFF", "DFFFFF", "FFFFCC", "FFFFFC", "FFFCFC",
               "DFFFC", "DFFFCC", "DDFFCC"]
    if args.schemes:
        schemes = args.schemes.split(",")

    print(f"{'scheme':12s} {'cost':>5s}  per-amp worst-err dB (vs 24F "
          f"truth), final-resid p99.9")
    for s in schemes:
        outs, fns = run_scheme(c, sc, st0, xs, s)
        outs = outs[256:]
        err = np.abs(outs - truth)
        db = [20 * np.log10(max(err[:, i].max(), 1e-12) / peak[i])
              for i in range(S)]
        fr = [np.percentile(fns[256:, i], 99.9) for i in range(S)]
        print(f"{s:12s} {cost_eq(s):5.2f}  "
              + "  ".join(f"{d:6.1f}" for d in db)
              + "   |  " + " ".join(f"{x:8.1e}" for x in fr))


if __name__ == "__main__":
    main()
