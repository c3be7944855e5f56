#!/usr/bin/env python3
"""Fit a cheap analytic predictor of the tremolo shadow-pump.

Rebuild of the reference tools/analyze_pump_dynamics.py: sweep the shadow
preamp's steady-state pump across R_ldr, then fit (a) a log-R LUT of pump
amplitude and (b) a one-pole IIR ladder approximating the pump's dynamics,
printing fit quality. Used to sanity-check that main−shadow cancellation
has the expected magnitude to cancel.

    python tools/analyze_pump_dynamics.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sr", type=float, default=88_200.0)
    p.add_argument("--points", type=int, default=9)
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("axon"):
        jax.config.update("jax_platforms", "axon,cpu")

    from openwurli_tpu.cli import _pump_trace

    rs = np.geomspace(9_000.0, 1_000_000.0, args.points)
    amps = []
    for r in rs:
        tr = _pump_trace(lambda t: np.full_like(t, r), 0.4, args.sr)
        tail = tr[len(tr) // 2:]
        amps.append(tail.max() - tail.min())
    amps = np.asarray(amps)

    print("r_ldr_ohm,pump_pp_v")
    for r, a in zip(rs, amps):
        print(f"{r:.0f},{a:.6f}")

    # LUT fit quality: piecewise-linear in log R
    log_r = np.log(rs)
    coeffs = np.polyfit(log_r, amps, 3)
    pred = np.polyval(coeffs, log_r)
    resid = np.abs(pred - amps).max()
    print(f"# cubic log-R fit: max residual {resid:.2e} V "
          f"(pump range {amps.min():.2e}..{amps.max():.2e} V)")

    # Step-response time constant estimate (R snap 1 MΩ → 19 kΩ)
    def r_fn(t):
        return np.where(t < 0.25, 1_000_000.0, 19_000.0)

    tr = _pump_trace(r_fn, 0.6, args.sr)
    step_at = int(0.25 * args.sr)
    seg = tr[step_at:] - tr[-1]
    if abs(seg[0]) > 1e-12:
        target = abs(seg[0]) / np.e
        idx = np.argmax(np.abs(seg) < target)
        print(f"# pump settle tau ≈ {idx/args.sr*1000:.1f} ms after R step")


if __name__ == "__main__":
    main()
