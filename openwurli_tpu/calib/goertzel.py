"""Single-bin spectral estimation — Goertzel-style magnitudes on device.

The calibration/analysis counterpart of the reference's ml/goertzel_utils.py
and the inline DFT helpers in its test suite, fully batched: magnitudes of
many harmonics over many renders compute as one einsum (TPU MXU work).
"""

from __future__ import annotations

import jax.numpy as jnp


def dft_magnitude(signal, freqs, sample_rate):
    """Exact single-bin DFT magnitudes.

    signal: (..., n) — batch of time series.
    freqs: (k,) or (..., k) — target frequencies per batch element.
    Returns (..., k) amplitude estimates (2/n * |Σ x e^{-jωt}|, i.e. the
    sine-amplitude convention used throughout the reference tests).
    """
    signal = jnp.asarray(signal, dtype=jnp.float64)
    freqs = jnp.asarray(freqs, dtype=jnp.float64)
    n = signal.shape[-1]
    t = jnp.arange(n, dtype=jnp.float64) / sample_rate
    ph = 2.0 * jnp.pi * freqs[..., None] * t  # (..., k, n)
    re = jnp.einsum("...n,...kn->...k", signal, jnp.cos(ph))
    im = jnp.einsum("...n,...kn->...k", signal, jnp.sin(ph))
    return 2.0 * jnp.sqrt(re**2 + im**2) / n


def refine_f0(signal, f0_guess, sample_rate, span_hz=5.0, steps=21):
    """Refine a fundamental estimate by scanning ±span for peak magnitude."""
    f0_guess = jnp.asarray(f0_guess, dtype=jnp.float64)
    offsets = jnp.linspace(-span_hz, span_hz, steps)
    cands = f0_guess[..., None] + offsets  # (..., steps)
    mags = dft_magnitude(signal, cands, sample_rate)
    best = jnp.argmax(mags, axis=-1)
    return jnp.take_along_axis(cands, best[..., None], axis=-1)[..., 0]


def harmonic_ladder(signal, f0, sample_rate, n_harmonics=12, refine=True):
    """Magnitudes of H1..Hn of a (batched) note render.

    Returns (refined_f0, mags (..., n_harmonics))."""
    f0 = jnp.asarray(f0, dtype=jnp.float64)
    if refine:
        f0 = refine_f0(signal, f0, sample_rate)
    harmonics = f0[..., None] * jnp.arange(1, n_harmonics + 1,
                                           dtype=jnp.float64)
    return f0, dft_magnitude(signal, harmonics, sample_rate)


def band_rms(signal, lo_hz, hi_hz, sample_rate):
    """RMS of the band [lo, hi] via rFFT masking (broadband HF metrics)."""
    signal = jnp.asarray(signal, dtype=jnp.float64)
    n = signal.shape[-1]
    spec = jnp.fft.rfft(signal, axis=-1)
    freqs = jnp.fft.rfftfreq(n, 1.0 / sample_rate)
    mask = (freqs >= lo_hz) & (freqs <= hi_hz)
    # Parseval: RMS of the band-limited signal
    power = jnp.sum(jnp.where(mask, jnp.abs(spec) ** 2, 0.0), axis=-1)
    # rfft double-counts everything but DC/nyquist; fine for band metrics
    return jnp.sqrt(2.0 * power) / n
