"""Per-note parameter tables for Wurlitzer 200A reed modal synthesis.

Physics derived from Euler-Bernoulli beam theory with tip mass, calibrated
against OBM 200A recordings. Behaviour-parity rebuild of the reference
parameter tables (reference: crates/openwurli-dsp/src/tables.rs).

Everything here is *vectorised over MIDI note arrays*: pass a scalar or an
array of notes and get batched parameters back — this is the TPU-native
replacement for the reference's per-note scalar functions, and it is what
lets a full 64-key × 8-velocity calibration grid be computed in one shot.

All functions are pure jnp (jit/vmap/grad-safe).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

NUM_MODES = 7
MIDI_LO = 33  # A1
MIDI_HI = 96  # C7
NUM_KEYS = MIDI_HI - MIDI_LO + 1  # 64 reeds

# Base mode amplitudes calibrated against OBM recordings (pickup-HPF-corrected
# mechanical mode levels; mode 2 at -46 dB). Reference: tables.rs:32-33.
BASE_MODE_AMPLITUDES = np.array(
    [1.0, 0.005, 0.0035, 0.0018, 0.0011, 0.0007, 0.0005], dtype=np.float64
)

# Cantilever-beam eigenvalue table: rows are tip-mass ratios mu, columns are
# the first 7 eigenvalues beta_n of
#   1 + cos(b)cosh(b) + b*mu*(cos(b)sinh(b) - sin(b)cosh(b)) = 0.
# Reference: tables.rs:84-123 (Section 2.5 eigenvalue analysis).
_EIG_MU = np.array([0.00, 0.01, 0.05, 0.10, 0.15, 0.20, 0.30, 0.50], dtype=np.float64)
_EIG_BETAS = np.array(
    [
        [1.8751, 4.6941, 7.8548, 10.9955, 14.1372, 17.2788, 20.4204],
        [1.8584, 4.6849, 7.8504, 10.9930, 14.1356, 17.2776, 20.4195],
        [1.7920, 4.6477, 7.8316, 10.9830, 14.1288, 17.2726, 20.4158],
        [1.7227, 4.6024, 7.8077, 10.9700, 14.1198, 17.2660, 20.4110],
        [1.6625, 4.5618, 7.7859, 10.9580, 14.1114, 17.2598, 20.4065],
        [1.6097, 4.5254, 7.7659, 10.9470, 14.1036, 17.2540, 20.4023],
        [1.5201, 4.4620, 7.7310, 10.9280, 14.0894, 17.2434, 20.3946],
        [1.3853, 4.3601, 7.6745, 10.8970, 14.0650, 17.2252, 20.3814],
    ],
    dtype=np.float64,
)

# Tip-mass-ratio anchors across the keyboard (tables.rs:50-58).
_MU_ANCHOR_MIDI = np.array([33.0, 52.0, 62.0, 74.0, 96.0], dtype=np.float64)
_MU_ANCHOR_VAL = np.array([0.10, 0.00, 0.00, 0.02, 0.01], dtype=np.float64)

# Displacement-scale calibration (tables.rs:250-252, Apr-2026 retune).
DS_AT_C4 = 0.85
DS_EXPONENT = 0.75
DS_CLAMP = (0.02, 0.95)

# Pickup plate active length in mm (tables.rs:306).
PLATE_ACTIVE_LENGTH_MM = 6.0

# Decay law: decay = 0.005 * f^1.22, floored (tables.rs:390-394).
MIN_DECAY_RATE = 3.0
MODE_DECAY_EXPONENT = 2.0

# Register trim anchors from zero-trim full-chain calibration at v=127
# (tables.rs:471-485).
_TRIM_ANCHOR_MIDI = np.array(
    [36.0, 40.0, 44.0, 48.0, 52.0, 56.0, 60.0, 64.0, 68.0, 72.0, 76.0, 80.0, 84.0],
    dtype=np.float64,
)
_TRIM_ANCHOR_DB = np.array(
    [-1.3, 0.0, -1.3, 0.7, 0.2, -1.0, 0.0, 0.9, 1.2, 0.0, 1.8, 2.4, 3.6],
    dtype=np.float64,
)

# Output staging constants (tables.rs:533-557).
POST_SPEAKER_GAIN_DB = 17.5
POST_SPEAKER_GAIN = 10.0 ** (POST_SPEAKER_GAIN_DB / 20.0)
FIXED_CIRCUIT_DRIVE = 0.25

PICKUP_HPF_FC = 2312.0  # Hz — pickup RC corner, used by the RMS proxy


@dataclasses.dataclass(frozen=True)
class CalibrationConfig:
    """Runtime-overridable calibration parameters (tables.rs:256-277)."""

    ds_at_c4: float = DS_AT_C4
    ds_exponent: float = DS_EXPONENT
    ds_clamp: tuple = DS_CLAMP
    target_db: float = -35.0
    voicing_slope: float = -0.04
    zero_trim: bool = False


def midi_to_freq(midi):
    """MIDI note number → fundamental frequency (Hz), A440 tuning."""
    m = jnp.asarray(midi, dtype=jnp.float64)
    return 440.0 * jnp.power(2.0, (m - 69.0) / 12.0)


def tip_mass_ratio(midi):
    """Estimated tip-mass ratio mu, linearly interpolated between anchors."""
    m = jnp.asarray(midi, dtype=jnp.float64)
    return jnp.interp(m, _MU_ANCHOR_MIDI, _MU_ANCHOR_VAL)


def eigenvalues(mu):
    """Cantilever eigenvalues beta_n for tip-mass ratio mu.

    Linear interpolation in mu over the solved eigenvalue table.
    Shape: mu (...) → betas (..., NUM_MODES).
    """
    mu = jnp.clip(jnp.asarray(mu, dtype=jnp.float64), 0.0, 0.5)
    # One jnp.interp per mode column, stacked — cheap (7 columns) and
    # vectorises over arbitrary mu batch shapes.
    cols = [jnp.interp(mu, _EIG_MU, _EIG_BETAS[:, i]) for i in range(NUM_MODES)]
    return jnp.stack(cols, axis=-1)


def mode_ratios(mu):
    """Mode frequency ratios f_n/f_1 = (beta_n/beta_1)^2. (..., NUM_MODES)."""
    betas = eigenvalues(mu)
    b1_sq = betas[..., 0:1] ** 2
    return betas**2 / b1_sq


def reed_length_mm(midi):
    """Reed length in mm — two-segment linear formula (tables.rs:159-167)."""
    m = jnp.asarray(midi, dtype=jnp.float64)
    n = jnp.clip(m - 32.0, 1.0, 64.0)
    inches = jnp.where(n <= 20.0, 3.0 - n / 20.0, 2.0 - (n - 20.0) / 44.0)
    return inches * 25.4


def reed_blank_dims(midi):
    """(width_mm, thickness_mm) from 200A blank dimensions (tables.rs:180-209).

    Five width blanks; thickness crossfades 0.026"→0.034" over reeds 16-26.
    """
    m = jnp.asarray(midi, dtype=jnp.float64)
    reed = jnp.clip(jnp.floor(m) - 32.0, 1.0, 64.0)

    width_inch = jnp.select(
        [reed <= 14, reed <= 20, reed <= 42, reed <= 50],
        [0.151, 0.127, 0.121, 0.111],
        default=0.098,
    )
    t_mid = 0.026 + (reed - 16.0) / 10.0 * (0.034 - 0.026)
    thickness_inch = jnp.select(
        [reed <= 16, reed <= 26],
        [jnp.full_like(reed, 0.026), t_mid],
        default=jnp.full_like(reed, 0.034),
    )
    return width_inch * 25.4, thickness_inch * 25.4


def reed_compliance(midi):
    """Beam tip compliance L^3 / (w * t^3) (tables.rs:217-221)."""
    length = reed_length_mm(midi)
    w, t = reed_blank_dims(midi)
    return length**3 / (w * t**3)


def pickup_displacement_scale(midi, cfg: CalibrationConfig = CalibrationConfig()):
    """Per-note displacement scale for the pickup 1/(1-y) nonlinearity."""
    c = reed_compliance(midi)
    c_ref = reed_compliance(60.0)
    ds = cfg.ds_at_c4 * (c / c_ref) ** cfg.ds_exponent
    return jnp.clip(ds, cfg.ds_clamp[0], cfg.ds_clamp[1])


def mode_shape(beta, xi):
    """Cantilever mode shape phi_n(xi) with tip mass (tables.rs:295-299)."""
    beta = jnp.asarray(beta, dtype=jnp.float64)
    xi = jnp.asarray(xi, dtype=jnp.float64)
    sigma = (jnp.cosh(beta) + jnp.cos(beta)) / (jnp.sinh(beta) + jnp.sin(beta))
    bx = beta * xi
    return jnp.cosh(bx) - jnp.cos(bx) - sigma * (jnp.sinh(bx) - jnp.sin(bx))


_N_SIMPSON = 32


def spatial_coupling_coefficients(mu, reed_len_mm_val):
    """Pickup spatial-coupling coefficients, normalised to mode 1.

    kappa_n = |∫ phi_n over the plate window| / (window * |phi_n(1)|), then
    kappa_n / kappa_1 — only differential suppression matters (the absolute
    kappa_1 is absorbed in the calibrated displacement scale).
    Reference: tables.rs:324-370 (Simpson's rule, 32 subintervals).

    Shapes: mu (...), reed_len (...) → (..., NUM_MODES).
    """
    mu = jnp.asarray(mu, dtype=jnp.float64)
    reed_len = jnp.asarray(reed_len_mm_val, dtype=jnp.float64)
    betas = eigenvalues(mu)  # (..., 7)
    ell_over_l = jnp.clip(PLATE_ACTIVE_LENGTH_MM / reed_len, 0.0, 1.0)[..., None]

    xi_start = 1.0 - ell_over_l
    h = ell_over_l / _N_SIMPSON
    # Simpson nodes: j = 0..32 → xi = xi_start + j*h, weights 1,4,2,4,...,4,1
    j = jnp.arange(_N_SIMPSON + 1, dtype=jnp.float64)
    weights = jnp.where(j % 2 == 1, 4.0, 2.0).at[0].set(1.0).at[-1].set(1.0)
    xi = xi_start[..., None] + j * h[..., None]  # (..., 7, 33)
    phi = mode_shape(betas[..., None], xi)  # (..., 7, 33)
    integral = jnp.sum(phi * weights, axis=-1) * h / 3.0

    tip_val = mode_shape(betas, jnp.ones_like(betas))
    k = jnp.abs(integral / (ell_over_l * tip_val))
    kappa_raw = jnp.clip(k, 0.0, 1.0)

    # Degenerate point-pickup case (tiny window or vanishing tip value)
    degenerate = (jnp.abs(tip_val) < 1e-30) | (ell_over_l < 1e-12)
    kappa_raw = jnp.where(degenerate, 1.0, kappa_raw)

    k1 = kappa_raw[..., 0:1]
    return jnp.where(k1 > 1e-30, jnp.clip(kappa_raw / k1, 0.0, 1.0), 1.0)


def fundamental_decay_rate(midi):
    """Fundamental decay rate in dB/s: 0.005 * f^1.22, floored at 3 dB/s."""
    f = midi_to_freq(midi)
    return jnp.maximum(0.005 * f**1.22, MIN_DECAY_RATE)


def mode_decay_rates(midi, ratios):
    """Per-mode decay rates: decay_1 * ratio_n^2 (Zener loss ∝ ω²)."""
    base = fundamental_decay_rate(midi)
    return base[..., None] * ratios * ratios


def pickup_rms_proxy(ds, f0, fc=PICKUP_HPF_FC):
    """Multi-harmonic RMS proxy for post-pickup level (tables.rs:438-454).

    Fourier magnitudes of y/(1-y) for y = ds·sin: c_n = 2 r^n / sqrt(1-ds²),
    r = (1-sqrt(1-ds²))/ds, each passed through the pickup HPF; RMS over H1-H8.
    """
    ds = jnp.asarray(ds, dtype=jnp.float64)
    f0 = jnp.asarray(f0, dtype=jnp.float64)
    ds_safe = jnp.maximum(ds, 1e-10)
    root = jnp.sqrt(jnp.maximum(1.0 - ds_safe * ds_safe, 1e-300))
    r = (1.0 - root) / ds_safe
    inv_sqrt = 1.0 / root
    n = jnp.arange(1, 9, dtype=jnp.float64)
    cn = 2.0 * r[..., None] ** n * inv_sqrt[..., None]
    nf = n * f0[..., None]
    hpf_n = nf / jnp.sqrt(nf * nf + fc * fc)
    rms = jnp.sqrt(jnp.sum((cn * hpf_n) ** 2, axis=-1))
    return jnp.where(ds < 1e-10, 0.0, rms)


def register_trim_db(midi):
    """Empirical register trim from Tier-3 render calibration at v=127."""
    m = jnp.asarray(midi, dtype=jnp.float64)
    return jnp.interp(m, _TRIM_ANCHOR_MIDI, _TRIM_ANCHOR_DB)


def velocity_exponent(midi):
    """Register-dependent velocity exponent — Gaussian bell centred at D4.

    Peak 1.7 mid-register; bass edge compressed to 0.55 (moderate-velocity
    growl), treble edge 1.3. Reference: tables.rs:632-651.
    """
    m = jnp.asarray(midi, dtype=jnp.float64)
    center, sigma, max_exp = 62.0, 15.0, 1.7
    t = jnp.exp(-0.5 * ((m - center) / sigma) ** 2)
    min_exp = jnp.where(m < center, 0.55, 1.3)
    return min_exp + t * (max_exp - min_exp)


def velocity_scurve(velocity):
    """Sigmoid velocity shaping — neoprene pad compression (tables.rs:659-665)."""
    v = jnp.asarray(velocity, dtype=jnp.float64)
    k = 1.5
    s = 1.0 / (1.0 + jnp.exp(-k * (v - 0.5)))
    s0 = 1.0 / (1.0 + jnp.exp(k * 0.5))
    s1 = 1.0 / (1.0 + jnp.exp(-k * 0.5))
    return (s - s0) / (s1 - s0)


def output_scale(midi, velocity_norm, cfg: CalibrationConfig = CalibrationConfig()):
    """Per-note output scaling to balance the keyboard (tables.rs:574-616).

    Three layers: velocity-aware multi-harmonic pickup proxy, voicing slope,
    empirical register trim (blended by velocity^1.3).
    """
    m = jnp.asarray(midi, dtype=jnp.float64)
    v = jnp.asarray(velocity_norm, dtype=jnp.float64)
    m, v = jnp.broadcast_arrays(m, v)

    ds = pickup_displacement_scale(m, cfg)
    f0 = midi_to_freq(m)

    scurve_v = velocity_scurve(v)
    vel_scale = scurve_v ** velocity_exponent(m)
    vel_scale_c4 = scurve_v ** velocity_exponent(60.0)
    effective_ds = jnp.maximum(ds * vel_scale, 1e-6)
    effective_ds_ref = jnp.maximum(cfg.ds_at_c4 * vel_scale_c4, 1e-6)

    rms = pickup_rms_proxy(effective_ds, f0)
    rms_ref = pickup_rms_proxy(effective_ds_ref, midi_to_freq(jnp.full_like(m, 60.0)))

    flat_db = -20.0 * jnp.log10(rms / rms_ref)
    voicing_db = cfg.voicing_slope * jnp.maximum(m - 60.0, 0.0)
    trim = jnp.zeros_like(m) if cfg.zero_trim else register_trim_db(m)
    effective_trim = trim * v**1.3

    return 10.0 ** ((cfg.target_db + flat_db + voicing_db + effective_trim) / 20.0)


def perceptual_beat_weight(beat_hz):
    """Psychoacoustic weighting for audible beating (tables.rs:703-725)."""
    b = jnp.asarray(beat_hz, dtype=jnp.float64)
    return jnp.select(
        [b < 0.5, b < 2.0, b <= 5.0, b <= 10.0, b <= 40.0],
        [
            jnp.zeros_like(b),
            0.5 * (b - 0.5) / 1.5,
            0.5 + 0.5 * (b - 2.0) / 3.0,
            jnp.ones_like(b),
            0.1 + 0.9 * (40.0 - b) / 30.0,
        ],
        default=0.1,
    )


def _dwell_attenuation_ff(fundamental_hz, ratios):
    """Dwell attenuation at ff (0.75 cycles), normalised to mode 0."""
    f = jnp.asarray(fundamental_hz, dtype=jnp.float64)
    t_dwell = jnp.clip(0.75 / f, 0.0003, 0.020)
    sigma_sq = 64.0
    ft = f[..., None] * ratios * t_dwell[..., None]
    atten = jnp.exp(-ft * ft / (2.0 * sigma_sq))
    a0 = atten[..., 0:1]
    return jnp.where(a0 > 1e-30, atten / a0, atten)


def intermod_risk(midi):
    """Per-note intermodulation risk (tables.rs:755-801), vectorised.

    Returns dict with per-mode products for modes 2-7 and scalar summaries.
    """
    m = jnp.asarray(midi, dtype=jnp.float64)
    f0 = midi_to_freq(m)
    mu = tip_mass_ratio(m)
    ratios = mode_ratios(mu)
    dwell = _dwell_attenuation_ff(f0, ratios)
    coupling = spatial_coupling_coefficients(mu, reed_length_mm(m))

    r = ratios[..., 1:]
    nearest = jnp.round(r)
    fractional_offset = jnp.abs(r - nearest)
    beat_hz = fractional_offset * f0[..., None]
    effective_amplitude = BASE_MODE_AMPLITUDES[1:] * coupling[..., 1:] * dwell[..., 1:]
    weight = perceptual_beat_weight(beat_hz)
    risk = effective_amplitude * weight
    return {
        "midi": m,
        "fundamental_hz": f0,
        "mu": mu,
        "mode_ratio": r,
        "nearest_integer": nearest,
        "fractional_offset": fractional_offset,
        "beat_hz": beat_hz,
        "effective_amplitude": effective_amplitude,
        "perceptual_weight": weight,
        "risk_score": risk,
        "max_risk": jnp.max(risk, axis=-1),
        "total_risk": jnp.sum(risk, axis=-1),
    }


def note_params(midi):
    """All per-note parameters, batched. Returns a dict of jnp arrays.

    mode amplitudes = BASE × spatial pickup coupling (hammer spatial coupling
    deliberately NOT applied — OBM-calibrated amplitudes already include it;
    reference tables.rs:810-821).
    """
    m = jnp.asarray(midi, dtype=jnp.float64)
    f0 = midi_to_freq(m)
    mu = tip_mass_ratio(m)
    ratios = mode_ratios(mu)
    decay_rates = mode_decay_rates(m, ratios)
    coupling = spatial_coupling_coefficients(mu, reed_length_mm(m))
    amplitudes = BASE_MODE_AMPLITUDES * coupling
    return {
        "fundamental_hz": f0,
        "mode_ratios": ratios,
        "mode_amplitudes": amplitudes,
        "mode_decay_rates": decay_rates,
    }
