"""OpenWurli-TPU — a TPU-native physical model of the Wurlitzer 200A.

A from-scratch JAX/Pallas rebuild of the capabilities of hal0zer0/openwurli
(reference: Rust CLAP/VST3 plugin + CLI tools + ML calibration pipeline).

Architecture (TPU-first, not a port):
  * Every DSP stage is a pure function ``(params, state, x) -> (state, y)``
    over jnp arrays; voices / notes / velocities are *batch axes*, not objects.
  * Sample-serial recurrences run under ``lax.scan`` (batch-vectorised) or a
    fused Pallas kernel with all state resident in VMEM.
  * Calibration sweeps shard the note × velocity grid over a device mesh
    with ``shard_map`` (data parallel — notes are independent).

Precision policy: circuit solvers (MNA / Newton-Raphson) run in float64
(``jax_enable_x64``); the per-voice oscillator path is float64 for reference
parity but is f32-safe at the −60 dB gate.
"""

import jax

# The MNA circuit solvers genuinely need f64 (Ce1 companion conductance is
# ~8 orders of magnitude above the bias-network conductances; f32 loses the
# operating point). Reference runs entirely in f64.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from openwurli_tpu import tables  # noqa: E402,F401
