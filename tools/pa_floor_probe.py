#!/usr/bin/env python3
"""Attribute the fixed-trajectory full-chain parity floor (−53 dB, round
4) between PA NR convergence and f32 state rounding.

Reruns tests/test_mono_chain.py::test_full_chain_parity_fixed_trajectory's
scenario under kernel-config variations (NR iteration budget, convergence
tolerance) and reports the relative/absolute error of each. If the floor
moves with iterations/tolerance it is a convergence artifact; if it is
flat, it is state-carry rounding and needs a compensated carry.

    JAX_PLATFORMS=cpu python tools/pa_floor_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# JAX_PLATFORMS=cpu in the env is NOT honored under the axon
# sitecustomize — the config must be set before any backend use
# (tests/conftest.py does the same; without this the probe silently
# runs on the tunneled TPU with emulated f64 and the tremolo DC solve
# misses its 1e-9 residual gate).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

BASE_SR = 44100.0
T_LEN = 8192
CACHE = "/tmp/pa_floor_y64.npz"


def _db(err, sig):
    return 20.0 * np.log10(max(np.sqrt(np.mean(err**2)), 1e-30)
                           / np.sqrt(np.mean(sig**2)))


def scenario():
    tt = np.arange(T_LEN) / BASE_SR
    env = np.minimum(np.arange(T_LEN) / 800.0, 1.0)
    audio = (env * 0.1 * (np.sin(2 * np.pi * 220 * tt)
                          + 0.5 * np.sin(2 * np.pi * 440 * tt))
             ).astype(np.float32)
    r = 12000 + 8000 * np.sin(2 * np.pi * 5.5 * tt)
    g = (1.0 / np.maximum(r, 1000.0)).astype(np.float32)
    return audio, g


def y64_ref(audio, g):
    if os.path.exists(CACHE):
        d = np.load(CACHE)
        if d["audio"].shape == audio.shape and np.allclose(d["audio"],
                                                           audio):
            return d["y64"]
    from tests.test_mono_chain import _f64_chain
    t0 = time.time()
    y64 = _f64_chain(audio.astype(np.float64), depth=0.5, volume=0.5,
                     character=0.0, gldr_seq=g.astype(np.float64))
    print(f"# y64 reference computed in {time.time() - t0:.0f}s",
          flush=True)
    np.savez(CACHE, audio=audio, y64=y64)
    return y64


def run_kernel(audio, g, keep64=(), step64=()):
    """keep64: state-key prefixes whose CARRY stays float64 across
    samples (the step itself then computes those paths in f64 via
    promotion) — bisects the f32 floor by stage. step64: prefixes
    upcast to f64 at the START of each sample and rounded back to f32
    after — in-step f64, f32 carry (the complement). Empty = the
    production all-f32 form."""
    from openwurli_tpu.kernels import mono_chain as mc
    c = mc.pack_consts(BASE_SR)
    carr = {k: jnp.asarray(v) for k, v in c.arrays.items()}
    sc = dict(c.scalars)
    names = [n for n, _ in mc.STATE_SPEC]
    ctrl = mc.make_controls(BASE_SR, 1, volume=0.5, depth=0.5,
                            character=0.0)
    cc = dict(carr)
    cc.update({k: jnp.asarray(v) for k, v in
               mc.unpack_controls(jnp.asarray(ctrl)).items()})
    flat = mc.init_state(BASE_SR, 1)
    st0 = {k: jnp.asarray(v)
           for k, v in mc.unpack_state(jnp.asarray(flat)).items()}

    def hi(k):
        return any(k.startswith(p) for p in keep64)

    def up(k):
        return any(k.startswith(p) for p in step64)

    st0 = {k: (v.astype(jnp.float64) if hi(k) else v)
           for k, v in st0.items()}

    def body32(carry, xg):
        x, gv = xg
        st = dict(zip(names, carry))
        st = {k: (v.astype(jnp.float64) if up(k) else v)
              for k, v in st.items()}
        st["gldr_cur"] = jnp.full_like(st["gldr_cur"], gv)
        st["gldr_upd_prev"] = jnp.full_like(st["gldr_upd_prev"], gv)
        st["trem_phase"] = jnp.zeros_like(st["trem_phase"])
        st, y = mc.base_step(cc, sc, st, x.reshape(1, 1))
        st = {k: v.astype(jnp.float64 if hi(k) else jnp.float32)
              for k, v in st.items()}
        return tuple(st[n] for n in names), y.ravel()

    _, y32 = jax.lax.scan(jax.jit(body32), tuple(st0[n] for n in names),
                          (jnp.asarray(audio), jnp.asarray(g)))
    return np.asarray(y32).ravel()


def main():
    audio, g = scenario()
    y64 = y64_ref(audio, g)

    from openwurli_tpu.kernels import mono_chain as mc

    variants = [
        ("base64probe (defaults)", {}),
        ("carry64: all", {"KEEP64": ("",)}),
        ("carry64: preamp", {"KEEP64": ("pre_",)}),
        ("carry64: power amp", {"KEEP64": ("pa_",)}),
        ("carry64: os+speaker", {"KEEP64": ("os_", "spk_")}),
        # in-step f64 but f32 carry: the complement of carry64 — if THIS
        # recovers the dB instead, the floor is in-step op rounding, not
        # the state store
        ("step64/carry32: preamp", {"STEP64": ("pre_",)}),
        ("seg64: pre lin", {"PRESEG": frozenset(("lin",))}),
        ("seg64: pre nr", {"PRESEG": frozenset(("nr",))}),
        ("seg64: pre lin+nr", {"PRESEG": frozenset(("lin", "nr"))}),
        ("seg64: pre sad", {"PRESEG": frozenset(("sad",))}),
        ("seg64: pre pred", {"PRESEG": frozenset(("pred",))}),
        ("seg64: pre dn", {"PRESEG": frozenset(("dn",))}),
        ("seg64: pre sad+pred", {"PRESEG": frozenset(("sad", "pred"))}),
        ("seg64: pre pred+dn", {"PRESEG": frozenset(("pred", "dn"))}),
        ("seg64: pre sad+dn", {"PRESEG": frozenset(("sad", "dn"))}),
        ("kc64 only", {"PRESEG": frozenset(("kc",))}),
        ("tpart64 only", {"PRESEG": frozenset(("tpart",))}),
        ("kc64+tpart64", {"PRESEG": frozenset(("kc", "tpart"))}),
        ("nrkc64", {"PRESEG": frozenset(("nr", "kc"))}),
        ("nrkctpart64", {"PRESEG": frozenset(("nr", "kc", "tpart"))}),
        ("psadA", {"PRESEG": frozenset(("psad",))}),
        ("psadB+nrkc", {"PRESEG": frozenset(("psad", "nr", "kc"))}),
        ("psadC+nr", {"PRESEG": frozenset(("psad", "nr"))}),
        ("psadD+kc", {"PRESEG": frozenset(("psad", "kc"))}),
        ("psadE+cfb", {"PRESEG": frozenset(("psad", "cfb"))}),
        ("psadF+tpfull", {"PRESEG": frozenset(("psad", "tpfull"))}),
        ("psadG+cfb+tpfull", {"PRESEG": frozenset(("psad", "cfb",
                                                   "tpfull"))}),
        ("psadH+all+nrkc", {"PRESEG": frozenset(
            ("psad", "cfb", "tpfull", "nr", "kc"))}),
        ("tpfullK alone", {"PRESEG": frozenset(("tpfull",))}),
        ("carry64 pre + pre_iters8", {"KEEP64": ("pre_",),
                                      "N_PRE_ITERS": 8}),
        ("carry64 pre+os+spk pi8", {"KEEP64": ("pre_", "os_", "spk_"),
                                    "N_PRE_ITERS": 8}),
        ("iters=12", {"N_PA_ITERS": 12}),
        ("iters=16", {"N_PA_ITERS": 16}),
        ("iters=6", {"N_PA_ITERS": 6}),
        ("iters=5", {"N_PA_ITERS": 5}),
        ("iters=4", {"N_PA_ITERS": 4}),
        ("tol=1e-5", {"PA_CONV_TOL": 1e-5}),
        ("iters=12 tol=1e-5", {"N_PA_ITERS": 12, "PA_CONV_TOL": 1e-5}),
        ("pre_iters=5", {"N_PRE_ITERS": 5}),
        ("pre_iters=8", {"N_PRE_ITERS": 8}),
        ("pre_iters=12", {"N_PRE_ITERS": 12}),
        ("pre8 iters12", {"N_PRE_ITERS": 8, "N_PA_ITERS": 12}),
        ("dense NR", {"PA_REDUCED": False}),
    ]
    saved = {k: getattr(mc, k) for k in
             ("N_PA_ITERS", "PA_CONV_TOL", "N_PRE_ITERS", "PA_REDUCED",
              "PA_REFRESH_ITERS")}
    import sys as _sys
    only = _sys.argv[1] if len(_sys.argv) > 1 else ""
    if only:
        variants = [v for v in variants if only in v[0]]
    base_err = None
    for tag, over in variants:
        over = dict(over)
        keep64 = over.pop("KEEP64", ())
        step64 = over.pop("STEP64", ())
        mc.PRE_STEP64 = over.pop("PRESEG", frozenset())
        for k, v in saved.items():
            setattr(mc, k, v)
        for k, v in over.items():
            setattr(mc, k, v)
        mc.PA_REFRESH_ITERS = tuple(range(mc.N_PA_ITERS))
        jax.clear_caches()
        t0 = time.time()
        y32 = run_kernel(audio, g, keep64=keep64, step64=step64)
        err = (y32 - y64)[1000:]
        db = _db(err, y64[1000:])
        dbfs = 20.0 * np.log10(max(np.sqrt(np.mean(err**2)), 1e-30))
        print(f"{tag:24s} rel={db:7.1f} dB  abs={dbfs:7.1f} dBFS  "
              f"({time.time() - t0:.0f}s)", flush=True)
        if base_err is None:
            base_err = err
    for k, v in saved.items():
        setattr(mc, k, v)

    # error concentration: is the error in brief events or uniform?
    e2 = base_err**2
    idx = np.argsort(e2)[::-1]
    top1 = e2[idx[: len(e2) // 100]].sum() / e2.sum()
    top10 = e2[idx[: len(e2) // 10]].sum() / e2.sum()
    print(f"# error energy concentration: top1%={top1:.2f} "
          f"top10%={top10:.2f}")


if __name__ == "__main__":
    main()
