"""Pallas TPU kernel: fused voice-bank render (reed + noise + pickup).

The per-voice path is thousands of tiny elementwise ops per sample under
`lax.scan`; per-step scan overhead dominates on TPU. This kernel fuses the
whole render into one Pallas program: all voice state lives in VMEM
scratch for the entire render, the time loop is a `fori_loop` inside the
kernel, and the grid walks output tiles sequentially (TPU grid order), so
state persists across tiles with zero HBM traffic for state.

Layout: voices on the 128-lane axis, modes on the 8-sublane axis —
(8, V) f32 blocks map exactly onto the VPU. f32 is sufficient here: the
quadrature renorm bounds rotation drift and the −60 dB parity gate sits
well above f32's noise floor for second-long renders (validated against
the f64 scan in tests/test_voice_kernel.py).

Covers the note-on render path used by calibration/batch workloads (onset
ramp, OU jitter subsampled every 16 samples, attack-noise burst through
its bandpass biquad, natural decay, quadrature renorm every 1024, pickup
bilinear charge + post gain); the damper (note-off) path stays in the f64
scan engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openwurli_tpu import pickup as pickup_mod
from openwurli_tpu.tables import NUM_MODES

LANES = 128
SUBLANES = 8  # ≥ NUM_MODES
JITTER_SUBSAMPLE = 16
RENORM_INTERVAL = 1024
NOISE_FADE_IN = 16
T_TILE = 512

# params rows. Rotation/decay coefficients are stored as DEVIATIONS
# (cos−1, 1−decay) computed in f64: the raw values sit so close to 1.0
# that f32 rounding of the value itself would dominate the phase/decay
# increment and accumulate to audible drift over a render; the deviations
# are small numbers that f32 carries with full relative precision.
ROW_COSM1, ROW_SIN, ROW_PHASE, ROW_AMP, ROW_DECAYM1 = 0, 1, 2, 3, 4
ROW_SCAL, ROW_DRIFT0, ROW_RNG0, ROW_NOISE = 5, 6, 7, 8
N_ROWS = 9


def _lcg(st):
    return st * jnp.uint32(1664525) + jnp.uint32(1013904223)


def _make_kernel(t_tile, steady):
    def _kernel(params_ref, out_ref, s_ref, c_ref, env_ref, drift_ref,
                q_ref, nstate_ref, irng_ref, nf_ref):
        return _kernel_body(t_tile, steady, params_ref, out_ref, s_ref,
                            c_ref, env_ref, drift_ref, q_ref, nstate_ref,
                            irng_ref, nf_ref)
    return _kernel


def _kernel_body(t_tile, steady, params_ref, out_ref, s_ref, c_ref,
                 env_ref, drift_ref, q_ref, nstate_ref, irng_ref, nf_ref):
    """One grid step renders t_tile samples for all lanes voices.

    steady: None, or (onset_done, noise_done) sample counts after which
    ALL voices' onset ramps / attack noises have finished — the
    transcendental onset shaping and the noise chain then run under a
    scalar pl.when and their cached scratch rows (nstate rows 3, 4) feed
    the steady-state samples for free."""
    tile = pl.program_id(0)

    @pl.when(tile == 0)
    def _init():
        s_ref[:] = jnp.zeros_like(s_ref)
        c_ref[:] = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, c_ref.shape, 0) < NUM_MODES,
            1.0, 0.0)
        env_ref[:] = jnp.ones_like(env_ref)
        drift_ref[:] = params_ref[ROW_DRIFT0]
        q_ref[:] = jnp.ones_like(q_ref)
        # int state rows: 0 = jitter LCG, 1 = noise LCG
        irng_ref[:] = pltpu.bitcast(params_ref[ROW_RNG0], jnp.int32)
        # noise float state rows: 0 = current amp, 1 = z1, 2 = z2
        namp = params_ref[ROW_NOISE][0:1, :]
        nstate_ref[:] = jnp.concatenate(
            [namp, jnp.zeros((SUBLANES - 1, namp.shape[1]), jnp.float32)],
            axis=0)
        nf_ref[0, 0] = 0.0

    cosm1 = params_ref[ROW_COSM1]      # cos(θ) − 1
    sin_inc = params_ref[ROW_SIN]
    phase_inc = params_ref[ROW_PHASE]
    amplitude = params_ref[ROW_AMP]
    decaym1 = params_ref[ROW_DECAYM1]  # 1 − decay_mult
    scal = params_ref[ROW_SCAL]
    onset_samps = scal[0:1, :]
    onset_inc = scal[1:2, :]
    onset_exp = scal[2:3, :]
    revert = scal[3:4, :]
    diffusion = scal[4:5, :]
    beta = scal[5:6, :]
    ds = scal[6:7, :]
    post_gain = scal[7:8, :]

    nz = params_ref[ROW_NOISE]
    noise_decay = nz[1:2, :]
    noise_dur = nz[2:3, :]
    nb0 = nz[3:4, :]
    nb2 = nz[4:5, :]
    na1 = nz[5:6, :]
    na2 = nz[6:7, :]

    base_n = tile * t_tile

    # Mosaic's scalar int→float convert lowering recurses in this jax
    # version, so the sample index is ALSO carried as an f32 running
    # counter (exact to 2^24 samples ≈ 380 s) in SMEM across tiles; the
    # int `n` serves the bitwise subsample/renorm tests only.
    def body(i, n_f):
        n = base_n + i

        def compute_onset():
            cosine = 0.5 * (1.0 - jnp.cos(n_f * onset_inc))
            shaped = jnp.where(
                onset_exp <= 1.001, cosine,
                jnp.where(onset_exp >= 1.999, cosine * cosine,
                          jnp.power(jnp.maximum(cosine, 1e-30),
                                    onset_exp)))
            return jnp.where(n_f < onset_samps, shaped, 1.0)

        if steady is None:
            onset = compute_onset()
        else:
            @pl.when(n_f < jnp.float32(steady[0]))
            def _onset():
                nstate_ref[3:4, :] = compute_onset()

            onset = nstate_ref[3:4, :]

        @pl.when((n & (JITTER_SUBSAMPLE - 1)) == 0)
        def _jitter():
            st = pltpu.bitcast(irng_ref[0:1, :], jnp.uint32)
            drift = drift_ref[:]
            rows = []
            # Exactly NUM_MODES draws per update — the LCG stream must
            # advance by 7, matching the reference (reed.rs:267-271).
            for m in range(NUM_MODES):
                st = _lcg(st)
                # u32→f32 via i32: Mosaic's direct unsigned→float lowering
                # recurses; after >>1 the top bit is clear so i32 is exact.
                u = (st >> jnp.uint32(1)).astype(jnp.int32).astype(
                    jnp.float32) * jnp.float32(2.0 / 4294967295.0)
                noise = (u * 2.0 - 1.0) * jnp.float32(1.7320508080)
                rows.append(revert * drift[m:m + 1, :] + diffusion * noise)
            rows.append(drift[NUM_MODES:, :])  # pad rows stay zero
            drift_ref[:] = jnp.concatenate(rows, axis=0)
            irng_ref[0:1, :] = pltpu.bitcast(st, jnp.int32)

        s = s_ref[:]
        c = c_ref[:]
        env = env_ref[:]
        drift = drift_ref[:]

        contrib = amplitude * s * onset * env
        mono = jnp.sum(contrib, axis=0, keepdims=True)  # (1, V)

        # Attack noise: LCG → bandpass biquad (DF-II-T) → amp env, while
        # sample index < duration; raised-cosine 16-sample fade-in.
        def compute_noise():
            nst = pltpu.bitcast(irng_ref[1:2, :], jnp.uint32)
            nst = _lcg(nst)
            white = nst.astype(jnp.int32).astype(jnp.float32) \
                * jnp.float32(1.0 / 2147483647.0)
            irng_ref[1:2, :] = pltpu.bitcast(nst, jnp.int32)
            namp = nstate_ref[0:1, :]
            z1 = nstate_ref[1:2, :]
            z2 = nstate_ref[2:3, :]
            filtered = nb0 * white + z1
            z1_new = -na1 * filtered + z2  # b1 = 0 for this bandpass
            z2_new = nb2 * white - na2 * filtered
            active = n_f < noise_dur
            fade_t = jnp.minimum(n_f / NOISE_FADE_IN, 1.0)
            fade = 0.5 * (1.0 - jnp.cos(jnp.float32(np.pi) * fade_t))
            fade = jnp.where(n_f < NOISE_FADE_IN, fade, 1.0)
            noise_out = jnp.where(active, namp * fade * filtered, 0.0)
            nstate_ref[0:1, :] = jnp.where(active, namp * noise_decay,
                                           namp)
            nstate_ref[1:2, :] = jnp.where(active, z1_new, z1)
            nstate_ref[2:3, :] = jnp.where(active, z2_new, z2)
            return noise_out

        if steady is None:
            mono = mono + compute_noise()
        else:
            @pl.when(n_f < jnp.float32(steady[1]))
            def _noise():
                nstate_ref[4:5, :] = compute_noise()

            mono = mono + nstate_ref[4:5, :]

        # Rotation via deviation form: with a = (cos−1) − δ·sin and
        # b = sin + δ·(1 + (cos−1)),  s' = s + s·a + c·b,  c' = c + c·a − s·b
        # — the state update is (state + small), so f32 rounding enters as
        # an unbiased random walk (~−100 dB over 1 s) instead of a
        # systematic phase/amplitude drift.
        delta = drift * phase_inc
        a = cosm1 - delta * sin_inc
        b = sin_inc + delta * (1.0 + cosm1)
        s_new = s + (s * a + c * b)
        c_new = c + (c * a - s * b)

        do_renorm = jnp.logical_and((n & (RENORM_INTERVAL - 1)) == 0, n > 0)
        r_sq = s_new * s_new + c_new * c_new
        r_inv = jax.lax.rsqrt(jnp.maximum(r_sq, 1e-30))
        scale = jnp.where(do_renorm, r_inv, 1.0)
        s_ref[:] = s_new * scale
        c_ref[:] = c_new * scale
        env_ref[:] = env - env * decaym1

        # Pickup: bilinear charge update with C1 soft saturation
        y_raw = mono * ds
        abs_y = jnp.abs(y_raw)
        knee = jnp.float32(pickup_mod.PICKUP_KNEE_Y)
        rng_sat = jnp.float32(pickup_mod.PICKUP_MAX_Y
                              - pickup_mod.PICKUP_KNEE_Y)
        sat = knee + rng_sat * jnp.tanh((abs_y - knee) / rng_sat)
        y = jnp.where(abs_y < knee, y_raw, jnp.where(y_raw >= 0, sat, -sat))
        omy = 1.0 - y
        alpha = beta * omy
        q = q_ref[0:1, :]
        q_next = (q * (1.0 - alpha) + 2.0 * beta) / (1.0 + alpha)
        q_ref[0:1, :] = q_next
        out = (q_next * omy - 1.0) * jnp.float32(
            pickup_mod.PICKUP_SENSITIVITY) * post_gain

        out_ref[i, :] = out[0, :]
        return n_f + 1.0

    # i32 bounds: under jax_enable_x64 python-int bounds make the loop
    # index i64, and Mosaic's i64→i32 convert lowering recurses infinitely.
    nf_ref[0, 0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(t_tile),
                                     body, nf_ref[0, 0])


def steady_limits(params):
    """(onset_done, noise_done) global sample counts for the `steady`
    gating, from a packed params array (+64-sample safety margin so the
    cached rows pass through their exact final values)."""
    p = np.asarray(params)
    onset = int(np.ceil(p[ROW_SCAL][0].max())) + 64
    noise = int(np.ceil(p[ROW_NOISE][2].max())) + 64
    return onset, noise


def render_voice_bank(params, num_samples: int, interpret: bool = False,
                      steady=None):
    """Render V voices × num_samples through the fused kernel.

    params: (N_ROWS, 8, V) f32 with V a multiple of 128 (see
    make_kernel_params — the per-kernel-step cost on this platform is a
    near-constant floor, so WIDE voice counts amortise it). The output
    tile shrinks automatically at wide V to stay within VMEM.
    Returns (num_samples, V) f32 post-pickup voice outputs.

    Runs under an x32 config context: jax_enable_x64 (on globally for the
    circuit solvers) crashes the Mosaic TPU backend's layout inference
    even for trivial kernels on this stack.
    """
    with jax.enable_x64(False):
        lanes = params.shape[-1]
        if lanes <= 8192:
            return _render_voice_bank_jit(params, num_samples, interpret,
                                          steady)
        # Wider banks exceed VMEM (params are pipeline-double-buffered):
        # render in 8192-lane chunks and stitch.
        chunks = [
            _render_voice_bank_jit(params[..., i:i + 8192], num_samples,
                                   interpret, steady)
            for i in range(0, lanes, 8192)]
        return jnp.concatenate(chunks, axis=-1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _render_voice_bank_jit(params, num_samples: int, interpret: bool,
                           steady=None):
    lanes = params.shape[-1]
    # Output tile ≤ ~1 MB so params + scratch + double-buffered output
    # stay inside the 16 MB VMEM budget at wide lane counts.
    t_tile = max(32, min(T_TILE, (1 << 20) // (lanes * 4) // 32 * 32))
    n_tiles = (num_samples + t_tile - 1) // t_tile
    total = n_tiles * t_tile
    out = pl.pallas_call(
        _make_kernel(t_tile, steady),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((N_ROWS, SUBLANES, lanes),
                               lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t_tile, lanes), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, lanes), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),  # s
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),  # c
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),  # env
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),  # drift
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),  # pickup q
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),  # noise amp/z1/z2
            pltpu.VMEM((SUBLANES, lanes), jnp.int32),    # LCG states
            pltpu.SMEM((1, 1), jnp.float32),             # f32 sample counter
        ],
        interpret=interpret,
    )(params)
    return out[:num_samples]


def make_kernel_params(midi_notes, velocities, sample_rate,
                       mlp_enabled=False, lanes=None):
    """Pack per-voice note-on parameters into the kernel layout.

    midi_notes/velocities: up to `lanes` entries (padded with silent
    voices); lanes defaults to the next multiple of 128.
    Returns (params (N_ROWS, 8, lanes) f32, n_active).
    """
    from openwurli_tpu import voice

    m = np.asarray(midi_notes, dtype=np.float64)
    v = np.asarray(velocities, dtype=np.float64)
    n_active = m.shape[0]
    lanes = lanes or max(128, ((n_active + 127) // 128) * 128)
    assert n_active <= lanes
    return _make_kernel_params_inner(m, v, n_active, sample_rate,
                                     mlp_enabled, lanes)


def _make_kernel_params_inner(m, v, n_active, sample_rate, mlp_enabled,
                              lanes):
    from openwurli_tpu import voice

    vparams, detuned = voice.note_on_params(
        jnp.asarray(m), jnp.asarray(v), sample_rate, mlp_enabled=mlp_enabled)
    state = voice.init_state(vparams, detuned, jnp.asarray(v), sample_rate,
                             voice.default_note_seed(jnp.asarray(m)))

    def pad_modes(x):  # (G, 7) → (8, lanes)
        arr = np.zeros((SUBLANES, lanes), dtype=np.float32)
        arr[:NUM_MODES, :n_active] = np.asarray(x, dtype=np.float32).T
        return arr

    def pad_scalar(x, fill=0.0):
        arr = np.full(lanes, fill, dtype=np.float32)
        arr[:n_active] = np.asarray(x, dtype=np.float32)
        return arr

    rp = vparams.reed
    scal = np.zeros((SUBLANES, lanes), dtype=np.float32)
    scal[0] = pad_scalar(rp.onset_ramp_samples)
    scal[1] = pad_scalar(rp.onset_ramp_inc)
    scal[2] = pad_scalar(rp.onset_shape_exp, fill=1.0)
    scal[3] = pad_scalar(rp.jitter_revert, fill=1.0)
    scal[4] = pad_scalar(rp.jitter_diffusion)
    scal[5] = pad_scalar(np.asarray(vparams.pickup.beta))
    scal[6] = pad_scalar(np.asarray(vparams.pickup.displacement_scale))
    scal[7] = pad_scalar(np.asarray(vparams.post_pickup_gain))

    drift0 = pad_modes(state.reed.jitter_drift)

    # int RNG states: row 0 jitter (post-Box-Muller), row 1 noise (raw seed)
    rng0 = np.zeros((SUBLANES, lanes), dtype=np.uint32)
    rng0[0, :n_active] = np.asarray(state.reed.jitter_state, dtype=np.uint32)
    rng0[1, :n_active] = np.asarray(state.noise.rng_state, dtype=np.uint32)

    nrow = np.zeros((SUBLANES, lanes), dtype=np.float32)
    nrow[0] = pad_scalar(np.asarray(state.noise.amplitude))
    nrow[1] = pad_scalar(np.asarray(vparams.noise.decay_per_sample))
    nrow[2] = pad_scalar(np.asarray(state.noise.remaining))
    nrow[3] = pad_scalar(np.asarray(vparams.noise.bpf.b0))
    nrow[4] = pad_scalar(np.asarray(vparams.noise.bpf.b2))
    nrow[5] = pad_scalar(np.asarray(vparams.noise.bpf.a1))
    nrow[6] = pad_scalar(np.asarray(vparams.noise.bpf.a2))

    import jax.numpy as _jnp

    params = np.stack([
        pad_modes(np.asarray(rp.cos_inc, dtype=np.float64) - 1.0),
        pad_modes(rp.sin_inc),
        pad_modes(rp.phase_inc),
        pad_modes(rp.amplitude),
        pad_modes(1.0 - np.asarray(rp.decay_mult, dtype=np.float64)),
        scal,
        drift0,
        rng0.view(np.float32),
        nrow,
    ], axis=0)
    return jnp.asarray(params), n_active
