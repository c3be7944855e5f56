#!/usr/bin/env python3
"""Generate precomputed settled solver states (package data).

Runs the Twin-T tremolo oscillator's 2 s settle on the local CPU for the
common engine rates and stores the final solver states in
openwurli_tpu/data/tremolo_settled.npz. Mirrors the reference's OnceLock
settled-state caches (melange_adapter.rs:12-29, power_amp.rs:288-305) but
persisted, so TPU sessions never pay a serial multi-second settle.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

RATES = [44100.0, 48000.0, 88200.0, 96000.0]
OUT = os.path.join(os.path.dirname(__file__), "..", "openwurli_tpu", "data",
                   "tremolo_settled.npz")


def main():
    from openwurli_tpu.circuits import tremolo

    # Force recompute (ignore any existing cache file).
    if os.path.exists(tremolo._SETTLED_CACHE_PATH):
        os.remove(tremolo._SETTLED_CACHE_PATH)

    payload = {}
    for sr in RATES:
        st = tremolo.settled_osc_state(sr)
        key = f"sr{int(round(sr))}"
        payload[f"{key}_v"] = np.asarray(st.v)
        payload[f"{key}_i"] = np.asarray(st.i_nl)
        payload[f"{key}_vnl"] = np.asarray(st.v_nl)
        print(f"settled {sr:.0f} Hz: out={payload[f'{key}_v'][0]:.4f} V")
        tremolo.settled_osc_state.cache_clear()
    np.savez(OUT, **payload)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
