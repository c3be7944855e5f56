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

Covers the full event-capable voice lifecycle:
  * note-on at a per-voice onset sample (quantized to 16 samples so the
    OU-jitter subsample grid — and therefore the LCG stream — stays
    bit-identical to the f64 path, reed.rs:266-271 semantics);
  * onset ramp, OU jitter every 16 samples, attack-noise burst through
    its bandpass biquad, natural decay, quadrature renorm every 1024,
    pickup bilinear charge + post gain;
  * note-off at a per-voice release sample: the reference's 3-phase
    progressive damper (reed.rs:191-216 — register-dependent ramp
    50/25/8 ms, higher modes ×3^m faster, top 5 keys undamped).
Sustain-pedal semantics are resolved by the host scheduler into effective
release samples (openwurli_tpu/fast.py:schedule_events).

State can be carried across kernel invocations (block streaming): pass
`state` from a previous call plus the global start sample `n0` to continue
a render without keeping the whole (T, V) voice output resident.
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
UNROLL = 8  # samples per fori group (see the time-loop comment below)
NEVER = 1.0e12  # release sentinel: voice is never damped

# params rows. Rotation/decay coefficients are stored as DEVIATIONS
# (cos−1, 1−decay) computed in f64: the raw values sit so close to 1.0
# that f32 rounding of the value itself would dominate the phase/decay
# increment and accumulate to audible drift over a render; the deviations
# are small numbers that f32 carries with full relative precision.
ROW_COSM1, ROW_SIN, ROW_PHASE, ROW_AMP, ROW_DECAYM1 = 0, 1, 2, 3, 4
ROW_SCAL, ROW_DRIFT0, ROW_RNG0, ROW_NOISE = 5, 6, 7, 8
# Event rows (onset/release schedule + damper constants)
ROW_EVT, ROW_DRATE, ROW_DM1 = 9, 10, 11
# Per-mode 1 − decay_mult^8 (f64 at pack time): the fast group advances
# env once per 8-sample group (env' = env − env·dm8m1) instead of 8
# sequential per-sample updates — one rounding per group instead of 8.
ROW_DM8M1 = 12
N_ROWS = 13

# ROW_EVT sublanes
EVT_ONSET_F, EVT_RELEASE_F, EVT_RAMP, EVT_ONSET_I = 0, 1, 2, 3

# Packed carry-state layout: (STATE_ROWS, V) f32 (int rows bitcast).
#   s 0:8 | c 8:16 | env 16:24 | drift 24:32 | nstate 32:40 | irng 40:48
# nstate rows: 0 noise amp, 1 z1, 2 z2, 3 onset cache, 4 noise cache,
#              5 pickup q; irng rows: 0 jitter LCG, 1 noise LCG.
STATE_ROWS = 48
_S0, _C0, _E0, _D0, _N0, _I0 = 0, 8, 16, 24, 32, 40


def _lcg(st):
    return st * jnp.uint32(1664525) + jnp.uint32(1013904223)


# Trace-time knockout level for kernel cost attribution (tools/vb_probe
# only — production paths leave this at 0). Levels attribute the
# FOLDED-COEFFICIENT group structure (round 5):
# 1: skip the batched pickup (stage passthrough).
# 2: also skip the per-sub-step mono staging writes (the reduced mode
#    sum folds into a (1, V) register, written once per group).
# 3: skip the mode-sum work entirely (out = broadcast of s0+c0 row 0;
#    refresh + jitter + state advance + loop overhead floor).
# 4: full pipeline but WITHOUT the onset/noise cached-row reads
#    (mono = raw mode sum) — isolates the steady-row read cost.
# 5: level 3 with every pl.when predicate pinned false (branches
#    present, never taken). 6: level 3 with the branches REMOVED from
#    the trace — separates branch-presence cost from taken-path cost.
# 7: level 3 + the 2-FMA per-sub-step mode products WITHOUT the
#    cross-sublane reduce (acc stays (8, V)) — isolates the reduce.
# 8: level 3 with the jitter branch doing LCG+drift only (stale
#    powers) — isolates _refresh_powers.
# 9: level 0 without the per-group env advance — isolates the env op.
VB_KO = 0


def _make_kernel(t_tile, steady, events, min_release):
    def _kernel(n0i_ref, n0f_ref, params_ref, state_in_ref, out_ref,
                state_out_ref, s_ref, c_ref, env_ref, drift_ref,
                nstate_ref, irng_ref, nf_ref, rota_ref, rotb_ref,
                stage_ref, onset8_ref, noise8_ref):
        return _kernel_body(t_tile, steady, events, min_release,
                            n0i_ref, n0f_ref, params_ref, state_in_ref,
                            out_ref, state_out_ref, s_ref, c_ref, env_ref,
                            drift_ref, nstate_ref, irng_ref, nf_ref,
                            rota_ref, rotb_ref, stage_ref, onset8_ref,
                            noise8_ref)
    return _kernel


# LCG composition constants: s_k = LCG_A_POW[k]·s + LCG_C_ACC[k] (mod
# 2^32) equals k sequential _lcg draws — lets the jitter block compute
# all NUM_MODES draws as ONE (8, V) op instead of 7 serial (1, V) ops.
_LCG_A_POW = [1]
_LCG_C_ACC = [0]
for _k in range(8):
    _LCG_A_POW.append((_LCG_A_POW[-1] * 1664525) & 0xFFFFFFFF)
    _LCG_C_ACC.append((_LCG_C_ACC[-1] * 1664525 + 1013904223) & 0xFFFFFFFF)


def _kernel_body(t_tile, steady, events, min_release, n0i_ref, n0f_ref,
                 params_ref, state_in_ref, out_ref, state_out_ref, s_ref,
                 c_ref, env_ref, drift_ref, nstate_ref, irng_ref, nf_ref,
                 rota_ref, rotb_ref, stage_ref, onset8_ref, noise8_ref):
    """One grid step renders t_tile samples for all lanes voices.

    steady: None, or (onset_done, noise_done) global sample counts after
    which ALL voices' onset ramps / attack noises have finished — the
    transcendental onset shaping and the noise chain then run under a
    scalar pl.when and their cached scratch rows (nstate rows 3, 4) feed
    the steady-state samples for free.

    events: static flag enabling the onset/release schedule + damper.
    min_release: static float — earliest possible release sample (the
    damper block runs under a scalar pl.when past it)."""
    tile = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    # Renorm hoist: legal whenever a tile can contain at most one renorm
    # point (the per-tile predicate below catches any alignment of the
    # streaming start offset n0). Renorm is a |r|~1 drift correction, so
    # its exact timing is free: the hoisted form applies it on the
    # GLOBAL sample grid (not per-voice onset-relative), one slot
    # earlier than the old in-loop form — identical between the events
    # and plain paths (the trivial-schedule bit-exactness gate relies on
    # that), ~1e-7 relative against the −60 dB parity gates.
    tile_renorm = t_tile <= RENORM_INTERVAL
    if not tile_renorm:
        raise ValueError(
            f"t_tile must be <= {RENORM_INTERVAL}: the quadrature renorm "
            "is hoisted to tile boundaries")

    @pl.when(tile == 0)
    def _init():
        s_ref[:] = state_in_ref[_S0:_S0 + 8]
        c_ref[:] = state_in_ref[_C0:_C0 + 8]
        env_ref[:] = state_in_ref[_E0:_E0 + 8]
        drift_ref[:] = state_in_ref[_D0:_D0 + 8]
        nstate_ref[:] = state_in_ref[_N0:_N0 + 8]
        irng_ref[:] = pltpu.bitcast(state_in_ref[_I0:_I0 + 8], jnp.int32)
        nf_ref[0, 0] = n0f_ref[0]
        # Steady-state values: the warm-phase group branches overwrite
        # these while any onset ramp / noise burst is live; past the
        # steady horizon the rows hold their exact final values (onset
        # ramps end at exactly 1.0, noise bursts at exactly 0.0), so
        # carried-state renders starting past the horizon are exact.
        onset8_ref[:] = jnp.ones_like(onset8_ref)
        noise8_ref[:] = jnp.zeros_like(noise8_ref)

    cosm1 = params_ref[ROW_COSM1]      # cos(θ) − 1
    sin_inc = params_ref[ROW_SIN]
    phase_inc = params_ref[ROW_PHASE]
    amplitude = params_ref[ROW_AMP]
    decaym1 = params_ref[ROW_DECAYM1]  # 1 − decay_mult
    dm8m1 = params_ref[ROW_DM8M1]      # 1 − decay_mult^8
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

    if events:
        evt = params_ref[ROW_EVT]
        onset_f = evt[EVT_ONSET_F:EVT_ONSET_F + 1, :]
        release_f = evt[EVT_RELEASE_F:EVT_RELEASE_F + 1, :]
        ramp_f = evt[EVT_RAMP:EVT_RAMP + 1, :]
        # (EVT_ONSET_I retired from the hot path: renorm is now on the
        # global tile grid, not per-voice onset-relative.)
        drate = params_ref[ROW_DRATE]
        dm1 = params_ref[ROW_DM1]

    def _rot_ab(drift):
        # Rotation coefficients (deviation form, see the body comment):
        # constant between OU jitter updates (every JITTER_SUBSAMPLE
        # samples), so they live in scratch and are refreshed only when
        # drift changes — saves ~6 (8,V) ops per sample in the hot loop.
        delta = drift * phase_inc
        return (cosm1 - delta * sin_inc,
                delta * (1.0 + cosm1) + sin_inc)

    def _refresh_powers():
        """Composed rotation powers in spiral-folded OUTPUT form.

        With z = (1+a) + i·b the one-step rotation, (A_j, B_j) =
        Re(z^j)−1 / Im(z^j) is R^j in deviation form (composition of
        deviations: A_{j+1} = A_j + a + A_j·a − B_j·b, B_{j+1} = B_j +
        b + B_j·a + A_j·b) — every sub-step's state is reachable
        directly from the group-start state with no serial dependency.

        Slots 0..6 hold the folded output coefficients for sub-steps
        j = 1..7: RA'_j = D_j·(1 + A_j), RB'_j = D_j·B_j with
        D_j = amplitude·dm^j (dm = per-mode natural decay multiplier).
        The group's output sample j is then
            mono_j = Σ_m (env0·s0)·RA'_j + (env0·c0)·RB'_j
        — the per-mode amplitude, natural decay power AND rotation are
        ONE pre-folded coefficient, so the hot loop is 2 FMAs + the
        mode reduce per sub-step (the serial-rotation kernel paid 5
        ops + the reduce + a per-sub-step env update). Slot 7 holds
        RAW R^8 for the group-end state advance — state arithmetic is
        unchanged (deviation form, bit-identical state path). Events
        programs additionally keep RAW R^1..R^7 in slots 8..14 for the
        post-release legacy groups (per-sub-step damper env).
        Refreshed only when drift changes (every JITTER_SUBSAMPLE
        samples).
        """
        a1, b1 = _rot_ab(drift_ref[:])
        dm = 1.0 - decaym1
        dj = amplitude * dm
        rota_ref[0:SUBLANES] = dj + dj * a1
        rotb_ref[0:SUBLANES] = dj * b1
        if events:
            rota_ref[8 * SUBLANES:9 * SUBLANES] = a1
            rotb_ref[8 * SUBLANES:9 * SUBLANES] = b1
        aj, bj = a1, b1
        for j in range(2, UNROLL + 1):
            a_new = aj + a1 + aj * a1 - bj * b1
            b_new = bj + b1 + bj * a1 + aj * b1
            aj, bj = a_new, b_new
            if j < UNROLL:
                dj = dj * dm
                rota_ref[(j - 1) * SUBLANES:j * SUBLANES] = dj + dj * aj
                rotb_ref[(j - 1) * SUBLANES:j * SUBLANES] = dj * bj
                if events:
                    rota_ref[(7 + j) * SUBLANES:(8 + j) * SUBLANES] = aj
                    rotb_ref[(7 + j) * SUBLANES:(8 + j) * SUBLANES] = bj
            else:
                rota_ref[(UNROLL - 1) * SUBLANES:UNROLL * SUBLANES] = aj
                rotb_ref[(UNROLL - 1) * SUBLANES:UNROLL * SUBLANES] = bj

    @pl.when(tile == 0)
    def _init_rot():
        _refresh_powers()

    base_n = tile * t_tile

    # Loop-invariant (8, V) rows for the batched jitter LCG: row m holds
    # the m+1-step composition constants (built from a sublane iota —
    # Pallas kernels can't take array literals), plus the mode mask that
    # keeps drift pad rows zero. Hoisted out of the time loop by Mosaic.
    lanes_v = cosm1.shape[-1]
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, lanes_v), 0)
    lcg_a8 = jnp.full((SUBLANES, lanes_v), jnp.uint32(0))
    lcg_c8 = jnp.full((SUBLANES, lanes_v), jnp.uint32(0))
    for _m in range(NUM_MODES):
        sel = sub_i == _m
        lcg_a8 = jnp.where(sel, jnp.uint32(_LCG_A_POW[_m + 1]), lcg_a8)
        lcg_c8 = jnp.where(sel, jnp.uint32(_LCG_C_ACC[_m + 1]), lcg_c8)
    mode_mask = sub_i < NUM_MODES

    # Time loop structure: UNROLL consecutive samples per fori iteration.
    # The reed recurrence (rotation/env/noise) runs per sub-step, but the
    # pickup — tanh soft-sat, the charge-update divide, and the output
    # store, the most expensive per-sample block — is BATCHED over the
    # group: its elementwise math runs once on (UNROLL, V) instead of
    # UNROLL times on (1, V) (a (1, V) op costs the same vreg count as an
    # (8, V) op — 1/8 of the VPU does the work), and the output store
    # writes full (8, 128) vregs instead of sublane-masked single rows.
    # Only the 2-op/step linear charge recurrence stays serial. Jitter
    # can only fire at sub-step 0: n ≡ gi·8 (mod 16) since n0 and t_tile
    # are multiples of 16, so its scalar predicate is hoisted per group.
    assert t_tile % JITTER_SUBSAMPLE == 0, t_tile
    if VB_KO and events:
        raise ValueError("VB_KO attribution variants support the plain "
                         "path only")

    knee = jnp.float32(pickup_mod.PICKUP_KNEE_Y)
    rng_sat = jnp.float32(pickup_mod.PICKUP_MAX_Y
                          - pickup_mod.PICKUP_KNEE_Y)
    sens = jnp.float32(pickup_mod.PICKUP_SENSITIVITY)
    twob = 2.0 * beta

    # Mosaic's scalar int→float convert lowering recurses in this jax
    # version, so the sample index is ALSO carried as an f32 running
    # counter (exact to 2^24 samples ≈ 380 s) in SMEM across tiles; the
    # int `n_g` serves the bitwise jitter-subsample test only.
    def group(gi, n_f0):
        n_g = n0i_ref[0] + base_n + gi * jnp.int32(UNROLL)

        if events:
            active0 = (n_f0 - onset_f) >= 0.0

        # (n_g & 15) is always 0 or 8 here, so comparing against 1 pins
        # the predicate false for the ko=5 branch-cost probe; ko=6 drops
        # the branch from the trace entirely (guard after the def).
        def _jitter():
            # Exactly NUM_MODES draws per update — the LCG stream must
            # advance by 7, matching the reference (reed.rs:267-271).
            # All 7 draws come out of ONE (8, V) composed-LCG op (row m
            # holds draw m+1): the old 7-serial-(1, V)-draw form cost a
            # full vreg op per mode per arithmetic step.
            st = pltpu.bitcast(irng_ref[0:1, :], jnp.uint32)
            drift = drift_ref[:]
            sk = lcg_a8 * st + lcg_c8          # (8, V) u32, wraps mod 2^32
            # u32→f32 via i32: Mosaic's direct unsigned→float lowering
            # recurses; after >>1 the top bit is clear so i32 is exact.
            u = (sk >> jnp.uint32(1)).astype(jnp.int32).astype(
                jnp.float32) * jnp.float32(2.0 / 4294967295.0)
            noise = (u * 2.0 - 1.0) * jnp.float32(1.7320508080)
            new_drift = jnp.where(mode_mask,
                                  revert * drift + diffusion * noise,
                                  drift)      # pad rows stay zero
            st_out = pltpu.bitcast(sk[NUM_MODES - 1:NUM_MODES, :],
                                   jnp.int32)
            if events:
                # Pre-onset voices' LCG streams must not advance: the
                # stream starts at note-on in the reference.
                drift_ref[:] = jnp.where(active0, new_drift, drift)
                irng_ref[0:1, :] = jnp.where(active0, st_out,
                                             irng_ref[0:1, :])
            else:
                drift_ref[:] = new_drift
                irng_ref[0:1, :] = st_out
            if VB_KO != 8:
                _refresh_powers()

        if VB_KO != 6:
            pl.when((n_g & (JITTER_SUBSAMPLE - 1))
                    == jnp.int32(VB_KO == 5))(_jitter)

        # Group-start state: every sub-step's quadrature state is
        # computed DIRECTLY from (s0, c0) via the composed rotation
        # powers (see _refresh_powers) — the 8 sub-steps are mutually
        # independent, so Mosaic can pipeline them instead of waiting on
        # an 8-deep serial rotation chain; only env (1 op/sub-step, plus
        # the branchless damper on the events path) stays serial. c is
        # not needed per sub-step at all — only at the group-end state
        # advance by R^UNROLL.
        s0 = s_ref[:]
        c0 = c_ref[:]
        env = env_ref[:]

        # ── warm-phase group branches: onset ramp + attack noise ────
        # Both cache full (8, V) scratch blocks consumed by the batched
        # pickup below. In steady state neither branch fires (their
        # cached rows hold exact final values: onset 1.0, noise 0.0),
        # so the sub-step loop is pure rotation arithmetic — no
        # branches, no scalar-row reads, no transcendentals. The +64
        # steady margin covers the group predicate's n_f0..n_f0+7 span.
        def _onset_group():
            for j in range(UNROLL):
                n_loc = (n_f0 + jnp.float32(j) - onset_f) if events \
                    else n_f0 + jnp.float32(j)
                cosine = 0.5 * (1.0 - jnp.cos(n_loc * onset_inc))
                shaped = jnp.where(
                    onset_exp <= 1.001, cosine,
                    jnp.where(onset_exp >= 1.999, cosine * cosine,
                              jnp.power(jnp.maximum(cosine, 1e-30),
                                        onset_exp)))
                onset8_ref[j:j + 1, :] = jnp.where(
                    n_loc < onset_samps, shaped, 1.0)

        # Attack noise: LCG → bandpass biquad (DF-II-T) → amp env,
        # while local index < duration; raised-cosine 16-sample fade.
        def _noise_group():
            for j in range(UNROLL):
                n_f = n_f0 + jnp.float32(j)
                if events:
                    n_loc = n_f - onset_f        # (1, V), <0 before onset
                    active = n_loc >= 0.0
                else:
                    n_loc = n_f
                nst = pltpu.bitcast(irng_ref[1:2, :], jnp.uint32)
                nst = _lcg(nst)
                white = nst.astype(jnp.int32).astype(jnp.float32) \
                    * jnp.float32(1.0 / 2147483647.0)
                nact = n_loc < noise_dur
                if events:
                    nact = jnp.logical_and(nact, active)
                    irng_ref[1:2, :] = jnp.where(
                        active, pltpu.bitcast(nst, jnp.int32),
                        irng_ref[1:2, :])
                else:
                    irng_ref[1:2, :] = pltpu.bitcast(nst, jnp.int32)
                namp = nstate_ref[0:1, :]
                z1 = nstate_ref[1:2, :]
                z2 = nstate_ref[2:3, :]
                filtered = nb0 * white + z1
                z1_new = -na1 * filtered + z2  # b1 = 0 for this bandpass
                z2_new = nb2 * white - na2 * filtered
                fade_t = jnp.minimum(n_loc / NOISE_FADE_IN, 1.0)
                fade = 0.5 * (1.0 - jnp.cos(jnp.float32(np.pi) * fade_t))
                fade = jnp.where(n_loc < NOISE_FADE_IN, fade, 1.0)
                noise8_ref[j:j + 1, :] = jnp.where(
                    nact, namp * fade * filtered, 0.0)
                nstate_ref[0:1, :] = jnp.where(nact, namp * noise_decay,
                                               namp)
                nstate_ref[1:2, :] = jnp.where(nact, z1_new, z1)
                nstate_ref[2:3, :] = jnp.where(nact, z2_new, z2)

        if steady is None:
            _onset_group()
            _noise_group()
        elif VB_KO != 6:
            pl.when(n_f0 < jnp.float32(steady[0]) if VB_KO != 5
                    else n_f0 < jnp.float32(-1.0))(_onset_group)
            pl.when(n_f0 < jnp.float32(steady[1]) if VB_KO != 5
                    else n_f0 < jnp.float32(-1.0))(_noise_group)

        env0 = env

        def _advance_state():
            # Group-end state advance by RAW R^UNROLL (slot 7): the
            # state path is deviation-form and bit-identical to the
            # serial-rotation kernel's — the spiral fold touches only
            # OUTPUT arithmetic, never carried state.
            a8 = rota_ref[(UNROLL - 1) * SUBLANES:UNROLL * SUBLANES]
            b8 = rotb_ref[(UNROLL - 1) * SUBLANES:UNROLL * SUBLANES]
            d_s = s0 * a8 + c0 * b8
            d_c = c0 * a8 - s0 * b8
            if events:
                s_ref[:] = jnp.where(active0, s0 + d_s, s0)
                c_ref[:] = jnp.where(active0, c0 + d_c, c0)
            else:
                s_ref[:] = s0 + d_s
                c_ref[:] = c0 + d_c

        if VB_KO in (3, 5, 6, 8):
            # Floor: refresh + jitter + env + state advance only.
            env_ref[:] = env0 - env0 * dm8m1
            _advance_state()
            acc = s0[0:1] + c0[0:1]
            out_ref[pl.ds(gi * jnp.int32(UNROLL), UNROLL), :] = \
                jnp.broadcast_to(acc, (UNROLL, acc.shape[-1]))
            return n_f0 + jnp.float32(UNROLL)

        def _fast_stage():
            """Spiral-folded mode sums for the whole group (see
            _refresh_powers): mono_j = Σ_m P·RA'_j + Q·RB'_j with
            P = env0·s0, Q = env0·c0 (j = 0 uses D_0 = amplitude
            directly), env advanced ONCE per group. Valid while no
            damper can be active inside the group — always on the
            plain path; groups strictly before min_release on the
            events path. Pre-onset lanes are masked out of P/Q (their
            c0 = 1 would otherwise leak RB' into the output) and their
            env stays frozen."""
            if events:
                p_row = jnp.where(active0, env0 * s0, 0.0)
                q_row = jnp.where(active0, env0 * c0, 0.0)
            else:
                p_row = env0 * s0
                q_row = env0 * c0
            acc = None
            for j in range(UNROLL):
                if j == 0:
                    t = amplitude * p_row
                else:
                    t = (p_row * rota_ref[(j - 1) * SUBLANES:j * SUBLANES]
                         + q_row * rotb_ref[(j - 1) * SUBLANES:
                                            j * SUBLANES])
                if VB_KO == 7:
                    acc = t if acc is None else acc + t
                elif VB_KO == 2:
                    m = jnp.sum(t, axis=0, keepdims=True)
                    acc = m if acc is None else acc + m
                else:
                    # Stage the group's rows in scratch (static sublane-
                    # row stores) — a Python list + concat keeps all 8
                    # values live on the Mosaic stack at once and blows
                    # the 16 MB VMEM budget.
                    stage_ref[j:j + 1, :] = jnp.sum(t, axis=0,
                                                    keepdims=True)
            if VB_KO != 9:
                env_new = env0 - env0 * dm8m1
                env_ref[:] = jnp.where(active0, env_new, env0) \
                    if events else env_new
            return acc

        def _legacy_stage():
            """Per-sub-step damper groups (events path at/after
            min_release): the 3-phase progressive damper
            (reed.rs:191-216) modulates env INSIDE the group, so the
            output coefficients cannot be pre-folded — contribution =
            amplitude·s_j·env_j with s_j from the RAW composed powers
            (slots 8..14). Release count t starts at 1 on the release
            sample; exponential ramp-in of the damping rate over
            ramp_f samples, then the constant per-mode multiplier
            (1−mult deviation). Branchless register form: lane masks
            select the phase (never-released lanes' exp overflows to
            inf — discarded by the select)."""
            env = env0
            for j in range(UNROLL):
                n_f = n_f0 + jnp.float32(j)
                t_rel = n_f - release_f + 1.0
                in_ramp = jnp.logical_and(t_rel >= 1.0, t_rel <= ramp_f)
                post = t_rel > ramp_f
                inst = drate * (t_rel / jnp.maximum(ramp_f, 1.0))
                env = jnp.where(in_ramp, env * jnp.exp(-inst), env)
                env = jnp.where(post, env - env * dm1, env)
                # Quadrature state at sub-step j directly from the
                # group-start state via RAW R^j (deviation form).
                # Pre-onset lanes stay frozen: onsets are quantized to
                # the 16-sample jitter grid and groups are 8 samples,
                # so active0 is constant across the group and masking
                # the rotation TERM keeps frozen lanes bit-identical.
                if j == 0:
                    sj = s0
                else:
                    aj = rota_ref[(7 + j) * SUBLANES:(8 + j) * SUBLANES]
                    bj = rotb_ref[(7 + j) * SUBLANES:(8 + j) * SUBLANES]
                    rot = s0 * aj + c0 * bj
                    rot = jnp.where(active0, rot, 0.0)
                    sj = s0 + rot
                stage_ref[j:j + 1, :] = jnp.sum(amplitude * sj * env,
                                                axis=0, keepdims=True)
                env = jnp.where(active0, env - env * decaym1, env)
            env_ref[:] = env

        if not events or min_release >= 0.5 * NEVER:
            # Plain path, or an events program whose schedule can never
            # release (static) — the legacy branch stays OUT of the
            # trace entirely.
            acc = _fast_stage()
        else:
            min_rel_f = jnp.float32(min_release)
            pl.when(n_f0 + jnp.float32(UNROLL) <= min_rel_f)(_fast_stage)
            pl.when(n_f0 + jnp.float32(UNROLL) > min_rel_f)(_legacy_stage)
            acc = None

        _advance_state()

        if VB_KO == 7:
            out_ref[pl.ds(gi * jnp.int32(UNROLL), UNROLL), :] = acc
            return n_f0 + jnp.float32(UNROLL)
        if VB_KO == 2:
            out_ref[pl.ds(gi * jnp.int32(UNROLL), UNROLL), :] = \
                jnp.broadcast_to(acc, (UNROLL, acc.shape[-1]))
            return n_f0 + jnp.float32(UNROLL)
        if VB_KO == 1:
            out_ref[pl.ds(gi * jnp.int32(UNROLL), UNROLL), :] = stage_ref[:]
            return n_f0 + jnp.float32(UNROLL)

        # Batched pickup: bilinear charge update with C1 soft saturation,
        # elementwise math once on the whole (UNROLL, V) group. The
        # onset ramp and attack noise apply here as (8, V) blocks —
        # mono = raw_mode_sum · onset + noise.
        if VB_KO == 4:
            mono8 = stage_ref[:]
        else:
            mono8 = stage_ref[:] * onset8_ref[:] + noise8_ref[:]
        y_raw = mono8 * ds
        abs_y = jnp.abs(y_raw)
        sat = knee + rng_sat * jnp.tanh((abs_y - knee) / rng_sat)
        y = jnp.where(abs_y < knee, y_raw,
                      jnp.where(y_raw >= 0, sat, -sat))
        omy = 1.0 - y
        alpha = beta * omy
        pn = 1.0 - alpha
        r = 1.0 / (1.0 + alpha)
        q = nstate_ref[5:6, :]
        for j in range(UNROLL):
            q = (q * pn[j:j + 1, :] + twob) * r[j:j + 1, :]
            stage_ref[j:j + 1, :] = q  # mono8 already consumed: reuse
        nstate_ref[5:6, :] = q
        out8 = (stage_ref[:] * omy - 1.0) * sens * post_gain
        out_ref[pl.ds(gi * jnp.int32(UNROLL), UNROLL), :] = out8
        return n_f0 + jnp.float32(UNROLL)

    # i32 bounds: under jax_enable_x64 python-int bounds make the loop
    # index i64, and Mosaic's i64→i32 convert lowering recurses infinitely.
    nf_ref[0, 0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(t_tile // 8),
                                     group, nf_ref[0, 0])

    if tile_renorm:
        # Fire iff a renorm point (multiple of RENORM_INTERVAL) lies in
        # the just-rendered tile (n_start, n_end] — robust to any n0.
        n_end = n0i_ref[0] + base_n + jnp.int32(t_tile)

        @pl.when((n_end & (RENORM_INTERVAL - 1)) < jnp.int32(t_tile))
        def _renorm_tile():
            s2 = s_ref[:]
            c2 = c_ref[:]
            r_inv = jax.lax.rsqrt(jnp.maximum(s2 * s2 + c2 * c2, 1e-30))
            if events:
                # Pre-onset voices must stay bit-frozen at their
                # note-on state (active as of the tile's last sample).
                act = (nf_ref[0, 0] - 1.0) >= onset_f
                s_ref[:] = jnp.where(act, s2 * r_inv, s2)
                c_ref[:] = jnp.where(act, c2 * r_inv, c2)
            else:
                s_ref[:] = s2 * r_inv
                c_ref[:] = c2 * r_inv

    @pl.when(tile == n_tiles - 1)
    def _fin():
        state_out_ref[_S0:_S0 + 8] = s_ref[:]
        state_out_ref[_C0:_C0 + 8] = c_ref[:]
        state_out_ref[_E0:_E0 + 8] = env_ref[:]
        state_out_ref[_D0:_D0 + 8] = drift_ref[:]
        state_out_ref[_N0:_N0 + 8] = nstate_ref[:]
        state_out_ref[_I0:_I0 + 8] = pltpu.bitcast(irng_ref[:], jnp.float32)


def init_bank_state(params):
    """Fresh note-on state for a packed params array → (STATE_ROWS, V).

    Accepts numpy or jax arrays, including tracers (the sharded fast path
    builds its per-device state inside shard_map)."""
    p = params
    lanes = p.shape[-1]
    if isinstance(p, np.ndarray):
        st = np.zeros((STATE_ROWS, lanes), dtype=np.float32)
        st[_C0:_C0 + NUM_MODES] = 1.0                 # c = 1 (modes only)
        st[_E0:_E0 + 8] = 1.0                         # env = 1
        st[_D0:_D0 + 8] = p[ROW_DRIFT0]               # OU drift init
        st[_N0 + 0] = p[ROW_NOISE][0]                 # noise amplitude
        st[_N0 + 5] = 1.0                             # pickup q
        st[_I0:_I0 + 8] = p[ROW_RNG0]                 # LCG seeds (bitcast)
        return st
    z8 = jnp.zeros((SUBLANES, lanes), jnp.float32)
    one = jnp.ones((1, lanes), jnp.float32)
    zero = jnp.zeros((1, lanes), jnp.float32)
    c0 = jnp.concatenate(
        [jnp.ones((NUM_MODES, lanes), jnp.float32),
         jnp.zeros((SUBLANES - NUM_MODES, lanes), jnp.float32)], axis=0)
    nst = jnp.concatenate(
        [p[ROW_NOISE, 0:1], zero, zero, zero, zero, one, zero, zero],
        axis=0)
    return jnp.concatenate(
        [z8, c0, jnp.ones((SUBLANES, lanes), jnp.float32),
         p[ROW_DRIFT0], nst, p[ROW_RNG0]], axis=0)


def steady_limits(params):
    """(onset_done, noise_done) global sample counts for the `steady`
    gating, from a packed params array (+64-sample safety margin so the
    cached rows pass through their exact final values)."""
    p = np.asarray(params)
    onset0 = p[ROW_EVT][EVT_ONSET_F] if p.shape[0] > ROW_EVT else 0.0
    onset = int(np.ceil((onset0 + p[ROW_SCAL][0]).max())) + 64
    noise = int(np.ceil((onset0 + p[ROW_NOISE][2]).max())) + 64
    return onset, noise


def _has_events(params) -> bool:
    # Slice BEFORE np.asarray: params may live on a (tunneled) device and
    # converting the whole array is a multi-MB device→host transfer per
    # call — only the two schedule rows are needed.
    if params.shape[0] <= ROW_EVT:
        return False
    evt = np.asarray(params[ROW_EVT, :2])
    # Compare in f32: NEVER is not f32-representable (stored sentinel is
    # 999999995904), and a Python-float comparison promotes to f64 under
    # NumPy<2, which would classify every stored sentinel as "has a
    # release" and permanently force the slower events kernel.
    return bool((evt[EVT_ONSET_F] > 0).any()
                or (evt[EVT_RELEASE_F] < np.float32(NEVER)).any())


def _min_release(params) -> float:
    rel = np.asarray(params[ROW_EVT, EVT_RELEASE_F])
    return float(rel.min()) if rel.size else NEVER


def render_voice_bank(params, num_samples: int, interpret: bool = False,
                      steady=None, state=None, n0: int = 0,
                      events=None, return_state: bool = False,
                      min_release=None):
    """Render V voices × num_samples through the fused kernel.

    params: (N_ROWS, 8, V) f32 with V a multiple of 128 (see
    make_kernel_params — the per-kernel-step cost on this platform is a
    near-constant floor, so WIDE voice counts amortise it). The output
    tile shrinks automatically at wide V to stay within VMEM.

    state/n0: carry state across block-streamed calls (state from a
    previous call's return_state=True, n0 = global start sample, a
    multiple of 16). n0 may be a jax scalar/tracer (int32): block-
    streaming loops then compile ONE program for all blocks instead of
    one per start offset — callers are responsible for the multiple-of-
    16 contract the int path asserts. events: force the event path on/off (default: auto
    from the params schedule); min_release: earliest possible release
    sample (default: auto). Pass BOTH explicitly in hot loops when
    params lives on-device — the auto-detect reads schedule rows back to
    the host, a per-call transfer. Returns (num_samples, V) f32
    post-pickup voice outputs, or (out, state') when return_state.

    Runs under an x32 config context: jax_enable_x64 (on globally for the
    circuit solvers) crashes the Mosaic TPU backend's layout inference
    even for trivial kernels on this stack.
    """
    if events is None:
        events = _has_events(params)
    if not events:
        min_rel = NEVER
    elif min_release is None:
        min_rel = _min_release(params)
    else:
        min_rel = float(min_release)
    if isinstance(n0, (int, np.integer)):
        assert n0 % JITTER_SUBSAMPLE == 0, n0
    with jax.enable_x64(False):
        n0i = jnp.asarray(n0, jnp.int32).reshape(1)
        n0f = n0i.astype(jnp.float32)  # exact to 2^24 samples (≈ 380 s)
        lanes = params.shape[-1]
        if state is None:
            state = init_bank_state(params)
        # The composed rotation-power caches (2 × (64, V) f32) put the
        # 8192-lane plain variant ~252 KB over the 16 MB VMEM budget, so
        # both paths now chunk at 4096 (the seam is gated bit-identical
        # in test_fast_sharded.py).
        max_lanes = 4096
        if lanes <= max_lanes:
            out, st = _render_voice_bank_jit(
                jnp.asarray(params), jnp.asarray(state), n0i, n0f,
                num_samples, interpret, steady, bool(events),
                float(min_rel), return_state)
            return (out, st) if return_state else out
        # Wider banks exceed VMEM (params are pipeline-double-buffered):
        # render in max_lanes chunks and stitch.
        outs, sts = [], []
        for i in range(0, lanes, max_lanes):
            o, s = _render_voice_bank_jit(
                jnp.asarray(params[..., i:i + max_lanes]),
                jnp.asarray(state[..., i:i + max_lanes]), n0i, n0f,
                num_samples, interpret, steady, bool(events),
                float(min_rel), return_state)
            outs.append(o)
            sts.append(s)
        out = jnp.concatenate(outs, axis=-1)
        if return_state:
            return out, jnp.concatenate(sts, axis=-1)
        return out


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def _render_voice_bank_jit(params, state, n0i, n0f, num_samples: int,
                           interpret: bool, steady, events: bool,
                           min_release: float, exact_state: bool = False):
    lanes = params.shape[-1]
    # Output tile ≤ ~1 MB so params + scratch + double-buffered output
    # stay inside the 16 MB VMEM budget at the 4096-lane chunk width.
    budget = 1 << 20
    t_tile = max(16, min(T_TILE, budget // (lanes * 4) // 16 * 16))
    if exact_state:
        # The grid renders n_tiles·t_tile samples; a CARRIED state must
        # correspond to num_samples exactly, so the tile must divide it.
        # Round down to a power of two FIRST: the VMEM-budget tile above
        # is only a multiple of 16 (e.g. 400 at 640 lanes), and halving
        # a non-power-of-two breaks the kernel's t_tile % 16 contract.
        # Powers of two also keep the hoisted renorm on the global
        # RENORM_INTERVAL grid for any tile size.
        t_tile = 1 << (int(t_tile).bit_length() - 1)
        while t_tile > 16 and num_samples % t_tile:
            t_tile //= 2
        assert num_samples % t_tile == 0, (
            f"state-carried renders need num_samples divisible by 16 "
            f"(got {num_samples})")
    n_tiles = (num_samples + t_tile - 1) // t_tile
    total = n_tiles * t_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((N_ROWS, SUBLANES, lanes),
                               lambda t, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((STATE_ROWS, lanes), lambda t, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((t_tile, lanes), lambda t, *_: (t, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((STATE_ROWS, lanes), lambda t, *_: (0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),  # s
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),  # c
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),  # env
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),  # drift
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),  # noise + pickup q
            pltpu.VMEM((SUBLANES, lanes), jnp.int32),    # LCG states
            pltpu.SMEM((1, 1), jnp.float32),             # f32 sample counter
            # Composed rotation powers (see _refresh_powers): folded
            # output coefficients j=1..7 + raw R^8; events programs add
            # raw R^1..R^7 for the post-release legacy groups.
            pltpu.VMEM(((15 if events else UNROLL) * SUBLANES, lanes),
                       jnp.float32),                     # RA' / A_j
            pltpu.VMEM(((15 if events else UNROLL) * SUBLANES, lanes),
                       jnp.float32),                     # RB' / B_j
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),  # pickup group stage
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),  # onset8 group cache
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),  # noise8 group cache
        ],
    )
    out, state_out = pl.pallas_call(
        _make_kernel(t_tile, steady, events, min_release),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((total, lanes), jnp.float32),
                   jax.ShapeDtypeStruct((STATE_ROWS, lanes), jnp.float32)),
        # state_in is read only at tile 0 and state_out written only at
        # the last tile, so they can share one VMEM buffer — the 1.5 MB
        # this frees at 8192 lanes is what lets the onset8/noise8 group
        # caches fit the 16 MB budget. (Index 3 = `state`, counting the
        # two scalar-prefetch operands.)
        input_output_aliases={3: 1},
        interpret=interpret,
    )(n0i, n0f, params, state)
    return out[:num_samples], state_out


def damper_rows(midi_notes, sample_rate):
    """Per-voice damper constants (reed.rs:191-216 / reed.start_damper).

    Returns (rate (8, V), one_minus_mult (8, V), ramp_samples (V,),
    undamped (V,) bool) in f64.
    """
    m = np.asarray(midi_notes, dtype=np.float64)
    base_rate = np.maximum(55.0 * 2.0 ** ((m - 60.0) / 24.0), 0.5)
    mode_pow = 3.0 ** np.arange(NUM_MODES, dtype=np.float64)
    factor = np.minimum(base_rate[None, :] * mode_pow[:, None], 2000.0)
    rate = factor / sample_rate                       # (7, V)
    rate8 = np.zeros((SUBLANES, m.shape[0]))
    rate8[:NUM_MODES] = rate
    dm1 = -np.expm1(-rate8)
    ramp_time = np.select([m < 48.0, m < 72.0], [0.050, 0.025], 0.008)
    return rate8, dm1, ramp_time * sample_rate, m >= 92.0


def make_kernel_params(midi_notes, velocities, sample_rate,
                       mlp_enabled=False, lanes=None,
                       onsets=None, releases=None, n_active=None):
    """Pack per-voice note-on parameters into the kernel layout.

    midi_notes/velocities: up to `lanes` entries (padded with silent
    voices); lanes defaults to the next multiple of 128.
    onsets: per-voice note-on sample indices (rounded to multiples of 16
    — the jitter subsample grid); releases: per-voice damper-start sample
    indices (np.inf / omitted = never; top-5 keys are never damped).
    n_active: treat only the first n_active entries as real voices
    (entries past it are ignored and padded with zeros) — lets callers
    with a LIVE schedule (fast_engine) pass fixed-length arrays so the
    eager packing math keeps one compiled shape per session instead of
    one per note count. Returns (params (N_ROWS, 8, lanes) f32,
    n_active).
    """
    m = np.asarray(midi_notes, dtype=np.float64)
    v = np.asarray(velocities, dtype=np.float64)
    if n_active is None:
        n_active = m.shape[0]
    assert n_active <= m.shape[0]
    lanes = lanes or max(128, ((n_active + 127) // 128) * 128)
    assert n_active <= lanes
    return _make_kernel_params_inner(m, v, n_active, sample_rate,
                                     mlp_enabled, lanes, onsets, releases)


def _make_kernel_params_inner(m, v, n_active, sample_rate, mlp_enabled,
                              lanes, onsets=None, releases=None):
    from openwurli_tpu import voice

    vparams, detuned = voice.note_on_params(
        jnp.asarray(m), jnp.asarray(v), sample_rate, mlp_enabled=mlp_enabled)
    state = voice.init_state(vparams, detuned, jnp.asarray(v), sample_rate,
                             voice.default_note_seed(jnp.asarray(m)))

    def pad_modes(x):  # (G, 7) → (8, lanes); G may exceed n_active
        arr = np.zeros((SUBLANES, lanes), dtype=np.float32)
        arr[:NUM_MODES, :n_active] = \
            np.asarray(x, dtype=np.float32).T[:, :n_active]
        return arr

    def pad_scalar(x, fill=0.0):
        arr = np.full(lanes, fill, dtype=np.float32)
        arr[:n_active] = np.asarray(x, dtype=np.float32)[..., :n_active]
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
    rng0[0, :n_active] = np.asarray(state.reed.jitter_state,
                                    dtype=np.uint32)[:n_active]
    rng0[1, :n_active] = np.asarray(state.noise.rng_state,
                                    dtype=np.uint32)[:n_active]

    nrow = np.zeros((SUBLANES, lanes), dtype=np.float32)
    nrow[0] = pad_scalar(np.asarray(state.noise.amplitude))
    nrow[1] = pad_scalar(np.asarray(vparams.noise.decay_per_sample))
    nrow[2] = pad_scalar(np.asarray(state.noise.remaining))
    nrow[3] = pad_scalar(np.asarray(vparams.noise.bpf.b0))
    nrow[4] = pad_scalar(np.asarray(vparams.noise.bpf.b2))
    nrow[5] = pad_scalar(np.asarray(vparams.noise.bpf.a1))
    nrow[6] = pad_scalar(np.asarray(vparams.noise.bpf.a2))

    # Event schedule + damper constants
    if onsets is None:
        on = np.zeros(n_active)
    else:
        on = np.asarray(onsets, dtype=np.float64)
        on = np.round(on / JITTER_SUBSAMPLE) * JITTER_SUBSAMPLE
    if releases is None:
        rel = np.full(n_active, NEVER)
    else:
        rel = np.asarray(releases, dtype=np.float64).copy()
        rel[~np.isfinite(rel)] = NEVER
    rate8, dm1, ramp, undamped = damper_rows(m, sample_rate)
    rel = np.where(undamped, NEVER, rel)
    evt = np.zeros((SUBLANES, lanes), dtype=np.float32)
    evt[EVT_ONSET_F] = pad_scalar(on)
    evt[EVT_RELEASE_F] = pad_scalar(rel, fill=NEVER)
    evt[EVT_RAMP] = pad_scalar(ramp, fill=1.0)
    oi = np.zeros(lanes, dtype=np.int32)
    oi[:n_active] = on.astype(np.int64).astype(np.int32)[:n_active]
    evt[EVT_ONSET_I] = oi.view(np.float32)
    drate_rows = np.zeros((SUBLANES, lanes), dtype=np.float32)
    drate_rows[:, :n_active] = rate8.astype(np.float32)[:, :n_active]
    dm1_rows = np.zeros((SUBLANES, lanes), dtype=np.float32)
    dm1_rows[:, :n_active] = dm1.astype(np.float32)[:, :n_active]

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
        evt,
        drate_rows,
        dm1_rows,
        pad_modes(1.0 - np.asarray(rp.decay_mult,
                                   dtype=np.float64) ** 8),
    ], axis=0)
    return jnp.asarray(params), n_active
