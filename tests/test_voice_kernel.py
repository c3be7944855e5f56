"""Fused Pallas voice-bank kernel vs the f64 scan reference.

Runs the kernel in interpreter mode on CPU and compares against
voice.render_note. Gate: −60 dB peak deviation (the project-wide parity
budget) over a 0.5 s render, which bounds the f32 + fused-kernel error.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from openwurli_tpu import voice
from openwurli_tpu.kernels import voice_bank

SR = 44100.0


@pytest.mark.slow
def test_kernel_matches_scan_within_60db():
    notes = [48.0, 60.0, 69.0, 84.0]
    vels = [0.95, 0.8, 0.6, 0.9]
    n = int(SR * 0.5)

    params, n_active = voice_bank.make_kernel_params(notes, vels, SR)
    out_k = np.asarray(voice_bank.render_voice_bank(params, n,
                                                    True))[:, :n_active]

    out_ref = np.asarray(voice.render_note(
        jnp.asarray(notes), jnp.asarray(vels), 0.5, SR))

    for k in range(n_active):
        ref = out_ref[:, k]
        got = out_k[:, k]
        peak = np.abs(ref).max()
        err = np.abs(got - ref).max()
        err_db = 20 * np.log10(max(err, 1e-300) / peak)
        assert err_db < -60.0, f"voice {k} (midi {notes[k]}): {err_db:.1f} dB"


def test_kernel_padding_is_silent():
    params, n_active = voice_bank.make_kernel_params([60.0], [0.8], SR)
    out = np.asarray(voice_bank.render_voice_bank(params, 600, True))
    assert np.abs(out[:, n_active:]).max() == 0.0
    assert np.abs(out[:, 0]).max() > 0.0


@pytest.mark.slow
def test_steady_gating_is_bit_exact():
    """The onset/attack-noise completion gating (steady=...) must not
    change a single sample (the cached scratch rows pass through the
    exact final values)."""
    notes = [48.0, 69.0]
    vels = [0.9, 0.7]
    n = 4096
    params, n_active = voice_bank.make_kernel_params(notes, vels, SR)
    steady = voice_bank.steady_limits(params)
    a = np.asarray(voice_bank.render_voice_bank(params, n, True))
    b = np.asarray(voice_bank.render_voice_bank(params, n, True,
                                                steady=steady))
    assert np.array_equal(a, b), np.abs(a - b).max()
