"""Modal reed oscillator — 7 damped quadrature sin/cos modes.

Each mode is a quadrature oscillator (rotation per sample, zero
transcendentals) with per-mode Ornstein-Uhlenbeck frequency jitter
(σ=0.04 %, τ=20 ms, subsampled every 16 samples) and quadrature radius
renormalisation every 1024 samples. Three-phase progressive damper on
note-off. Behaviour-parity rebuild of crates/openwurli-dsp/src/reed.rs.

TPU-native design: params and state are flat arrays with arbitrary leading
batch dims (voices × notes × velocities); `step` is a pure scan body, so 64
voices advance as one (V, 7) vector op per sample.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from openwurli_tpu import prng
from openwurli_tpu.tables import NUM_MODES

JITTER_SIGMA = 0.0004
JITTER_TAU = 0.020
JITTER_SUBSAMPLE = 16
RENORM_INTERVAL = 1024
TAU = 6.283185307179586
DB_PER_NEPER = 8.686


class ReedParams(NamedTuple):
    """Per-voice constants computed at note-on. Leading dims = batch."""

    cos_inc: jnp.ndarray  # (..., 7)
    sin_inc: jnp.ndarray  # (..., 7)
    phase_inc: jnp.ndarray  # (..., 7)
    amplitude: jnp.ndarray  # (..., 7)
    decay_mult: jnp.ndarray  # (..., 7)
    onset_ramp_samples: jnp.ndarray  # (...,) int
    onset_ramp_inc: jnp.ndarray  # (...,)
    onset_shape_exp: jnp.ndarray  # (...,)
    jitter_revert: jnp.ndarray  # (...,)
    jitter_diffusion: jnp.ndarray  # (...,)


class ReedState(NamedTuple):
    s: jnp.ndarray  # (..., 7)
    c: jnp.ndarray  # (..., 7)
    envelope: jnp.ndarray  # (..., 7)
    jitter_drift: jnp.ndarray  # (..., 7)
    jitter_state: jnp.ndarray  # (...,) uint32
    n: jnp.ndarray  # (...,) int64 sample counter
    # Damper (set by note_off / start_damper)
    damper_active: jnp.ndarray  # (...,) bool
    damper_rate: jnp.ndarray  # (..., 7) nepers/sample
    damper_mult: jnp.ndarray  # (..., 7)
    damper_ramp_samples: jnp.ndarray  # (...,)
    damper_release_count: jnp.ndarray  # (...,)
    damper_ramp_done: jnp.ndarray  # (...,) bool


def make_params(
    fundamental_hz,
    mode_ratios,
    amplitudes,
    decay_rates_db,
    onset_time_s,
    velocity,
    sample_rate,
) -> ReedParams:
    """Precompute rotation/decay/onset constants (reed.rs:108-181)."""
    f0 = jnp.asarray(fundamental_hz, dtype=jnp.float64)
    freq = f0[..., None] * mode_ratios
    phase_inc = TAU * freq / sample_rate
    decay_per_sample = decay_rates_db / DB_PER_NEPER / sample_rate

    dt = 1.0 / sample_rate
    revert = jnp.exp(jnp.asarray(-dt / JITTER_TAU, dtype=jnp.float64))
    diffusion = JITTER_SIGMA * jnp.sqrt(1.0 - revert * revert)

    ramp_samps = jnp.round(
        jnp.asarray(onset_time_s, dtype=jnp.float64) * sample_rate
    ).astype(jnp.int64)
    ramp_inc = jnp.where(ramp_samps > 0, jnp.pi / jnp.maximum(ramp_samps, 1), 0.0)
    shape_exp = 1.0 + (1.0 - jnp.asarray(velocity, dtype=jnp.float64))

    return ReedParams(
        cos_inc=jnp.cos(phase_inc),
        sin_inc=jnp.sin(phase_inc),
        phase_inc=phase_inc,
        amplitude=jnp.asarray(amplitudes, dtype=jnp.float64),
        decay_mult=jnp.exp(-decay_per_sample),
        onset_ramp_samples=ramp_samps,
        onset_ramp_inc=ramp_inc,
        onset_shape_exp=shape_exp,
        jitter_revert=jnp.broadcast_to(revert, f0.shape),
        jitter_diffusion=jnp.broadcast_to(diffusion, f0.shape),
    )


def init_state(params: ReedParams, jitter_seed) -> ReedState:
    """Note-on state: quadrature at phase 0, OU drift from its stationary
    distribution via Box-Muller (bit-exact LCG stream, reed.rs:123-134)."""
    seed = jnp.asarray(jitter_seed).astype(jnp.uint32)
    state, draws = prng.box_muller_draws(seed, NUM_MODES)
    batch = params.amplitude.shape[:-1]
    zeros7 = jnp.zeros(batch + (NUM_MODES,), dtype=jnp.float64)
    return ReedState(
        s=zeros7,
        c=jnp.ones_like(zeros7),
        envelope=jnp.ones_like(zeros7),
        jitter_drift=JITTER_SIGMA * draws * jnp.ones_like(zeros7),
        jitter_state=jnp.broadcast_to(state, batch),
        n=jnp.zeros(batch, dtype=jnp.int64),
        damper_active=jnp.zeros(batch, dtype=bool),
        damper_rate=zeros7,
        damper_mult=jnp.ones_like(zeros7),
        damper_ramp_samples=jnp.zeros(batch, dtype=jnp.float64),
        damper_release_count=jnp.zeros(batch, dtype=jnp.float64),
        damper_ramp_done=jnp.zeros(batch, dtype=bool),
    )


def start_damper(state: ReedState, midi_note, sample_rate, active=True) -> ReedState:
    """Three-phase progressive damper (reed.rs:191-216).

    Top 5 keys (midi ≥ 92) are undamped. Higher modes damped ×3^m faster,
    register-dependent ramp 50/25/8 ms. `active` masks batched note-offs.
    """
    m = jnp.asarray(midi_note, dtype=jnp.float64)
    no_damper = m >= 92.0
    act = jnp.asarray(active, dtype=bool) & ~no_damper

    base_rate = jnp.maximum(55.0 * 2.0 ** ((m - 60.0) / 24.0), 0.5)
    mode_pow = 3.0 ** jnp.arange(NUM_MODES, dtype=jnp.float64)
    factor = jnp.minimum(base_rate[..., None] * mode_pow, 2000.0)
    rate = factor / sample_rate
    mult = jnp.exp(-rate)

    ramp_time = jnp.select(
        [m < 48.0, m < 72.0], [jnp.full_like(m, 0.050), jnp.full_like(m, 0.025)],
        default=0.008,
    )

    a = act[..., None]
    return state._replace(
        damper_rate=jnp.where(a, rate, state.damper_rate),
        damper_mult=jnp.where(a, mult, state.damper_mult),
        damper_ramp_samples=jnp.where(act, ramp_time * sample_rate,
                                      state.damper_ramp_samples),
        damper_active=state.damper_active | act,
        damper_release_count=jnp.where(act, 0.0, state.damper_release_count),
        damper_ramp_done=jnp.where(act, False, state.damper_ramp_done),
    )


def step(params: ReedParams, state: ReedState):
    """One sample for all batched voices. Returns (state, output).

    Mirrors the reference per-sample order exactly (reed.rs:219-306):
    damper → onset → jitter subsample → output/rotate/decay → renorm.
    """
    # ── Damper advance ──
    rel_count = jnp.where(state.damper_active,
                          state.damper_release_count + 1.0,
                          state.damper_release_count)
    t = rel_count
    ramp = state.damper_ramp_samples
    past_ramp = t > ramp
    in_ramp = state.damper_active & ~state.damper_ramp_done & ~past_ramp
    ramp_done = state.damper_ramp_done | (state.damper_active & past_ramp)

    inst_rate = state.damper_rate * (t / jnp.maximum(ramp, 1e-30))[..., None]
    env = state.envelope * jnp.where(in_ramp[..., None], jnp.exp(-inst_rate), 1.0)
    env = env * jnp.where((state.damper_active & ramp_done)[..., None],
                          state.damper_mult, 1.0)

    # ── Onset ramp ──
    n_f = state.n.astype(jnp.float64)
    cosine = 0.5 * (1.0 - jnp.cos(n_f * params.onset_ramp_inc))
    e = params.onset_shape_exp
    shaped = jnp.where(
        e <= 1.001, cosine,
        jnp.where(e >= 1.999, cosine * cosine,
                  jnp.power(jnp.maximum(cosine, 0.0), e)),
    )
    onset = jnp.where(state.n < params.onset_ramp_samples, shaped, 1.0)

    # ── Jitter subsample update (7 sequential LCG draws per voice) ──
    do_jitter = (state.n & (JITTER_SUBSAMPLE - 1)) == 0
    jst = state.jitter_state
    noises = []
    for _ in range(NUM_MODES):
        jst, nz = prng.lcg_uniform_scaled(jst)
        noises.append(nz)
    noise = jnp.stack(noises, axis=-1)
    new_drift = (params.jitter_revert[..., None] * state.jitter_drift
                 + params.jitter_diffusion[..., None] * noise)
    drift = jnp.where(do_jitter[..., None], new_drift, state.jitter_drift)
    jitter_state = jnp.where(do_jitter, jst, state.jitter_state)

    # ── Output + quadrature rotation (Taylor-corrected) + natural decay ──
    out = jnp.sum(params.amplitude * state.s * onset[..., None] * env, axis=-1)

    delta_phase = drift * params.phase_inc
    ci = params.cos_inc - delta_phase * params.sin_inc
    si = params.sin_inc + delta_phase * params.cos_inc
    s_new = state.s * ci + state.c * si
    c_new = state.c * ci - state.s * si
    env = env * params.decay_mult

    # ── Renorm every 1024 samples ──
    do_renorm = ((state.n & (RENORM_INTERVAL - 1)) == 0) & (state.n > 0)
    r_inv = 1.0 / jnp.sqrt(s_new * s_new + c_new * c_new)
    scale = jnp.where(do_renorm[..., None], r_inv, 1.0)

    new_state = state._replace(
        s=s_new * scale,
        c=c_new * scale,
        envelope=env,
        jitter_drift=drift,
        jitter_state=jitter_state,
        n=state.n + 1,
        damper_release_count=rel_count,
        damper_ramp_done=ramp_done,
    )
    return new_state, out


def render(params: ReedParams, state: ReedState, num_samples: int):
    """Render num_samples. Output shape (num_samples, ...batch)."""

    def body(st, _):
        return step(params, st)

    state, out = jax.lax.scan(body, state, None, length=num_samples)
    return state, out


def is_silent(params: ReedParams, state: ReedState, threshold_db=-80.0):
    thr = 10.0 ** (threshold_db / 20.0)
    return jnp.all(jnp.abs(params.amplitude * state.envelope) <= thr, axis=-1)


def release_seconds(state: ReedState, sample_rate):
    return jnp.where(state.damper_active,
                     state.damper_release_count / sample_rate, 0.0)
