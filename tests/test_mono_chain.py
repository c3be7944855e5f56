"""Fused mono-chain kernel (f32 deviation form) vs the f64 module chain.

Stage-by-stage and full-chain parity gates for kernels/mono_chain.py. The
f64 modules (circuits/*) are the accuracy reference; the kernel twin
(render_cpu) runs the exact step functions the Pallas kernel traces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openwurli_tpu.circuits import dk_preamp as dkp
from openwurli_tpu.circuits import power_amp as pamod
from openwurli_tpu.circuits import speaker as spkmod
from openwurli_tpu.circuits import tremolo as trmod
from openwurli_tpu.kernels import mono_chain as mc
from openwurli_tpu.ops import allpass

BASE_SR = 44100.0
OS_SR = 2 * BASE_SR


def _db(err, sig):
    return 20.0 * np.log10(max(np.sqrt(np.mean(err**2)), 1e-30)
                           / np.sqrt(np.mean(sig**2)))


def _kernel_env():
    c = mc.pack_consts(BASE_SR)
    carr = {k: jnp.asarray(v) for k, v in c.arrays.items()}
    return c, carr, dict(c.scalars), [n for n, _ in mc.STATE_SPEC]


def test_ge_solve_flat():
    rng = np.random.default_rng(0)
    s, m = 5, 16
    a = np.eye(m)[None] + 0.1 * rng.standard_normal((s, m, m))
    b = rng.standard_normal((s, m))
    x_ref = np.linalg.solve(a, b[..., None])[..., 0]
    cols = [jnp.asarray(a[:, :, j].T, jnp.float32) for j in range(m)]
    x = np.asarray(mc._ge_solve_flat(cols, jnp.asarray(b.T, jnp.float32), m))
    assert np.abs(x.T - x_ref).max() < 1e-5


def test_ge_solve_ports_block_identity():
    """Compact reduced-pivot solve == dense solve of [[A,0],[C,I]]:
    random unit-dominant systems with the PA's active/relegated split."""
    rng = np.random.default_rng(1)
    s, n = 7, 16
    order, releg = mc.PA_ACTIVE, mc.PA_RELEG
    n_act = len(order)
    a_full = np.zeros((s, n, n))
    a_full[:, :, :] = np.eye(n)[None]
    # active columns get dense entries everywhere; relegated columns
    # stay identity (the block structure the reduced NR exploits)
    for j in order:
        a_full[:, :, j] = 0.15 * rng.standard_normal((s, n))
        a_full[:, j, j] += 1.0
    b = rng.standard_normal((s, n))
    x_ref = np.linalg.solve(a_full, b[..., None])[..., 0]

    cols_a = [jnp.asarray(a_full[:, list(order), j].T, jnp.float32)
              for j in order]
    cols_r = [jnp.asarray(a_full[:, list(releg), j].T, jnp.float32)
              for j in order]
    f_act = jnp.asarray(b[:, list(order)].T, jnp.float32)
    f_rel = jnp.asarray(b[:, list(releg)].T, jnp.float32)
    x = np.asarray(mc._ge_solve_ports(cols_a, cols_r, f_act, f_rel,
                                      order, releg))
    assert x.shape == (n, s)
    assert np.abs(x.T - x_ref).max() < 1e-4


def test_preamp_stage_parity():
    """f32 twin-preamp step vs dk_preamp.step over a tremolo-swept render.

    −64 dB gate: the (shadow, diff) state basis keeps the tremolo pump's
    ±80 V excursions common-mode between the twins, so the output floor
    scales with signal, not with the pump (measured −66…−69 dB across
    drive levels and the full shunt range)."""
    c, carr, sc, names = _kernel_env()
    t_len = 3000
    t = np.arange(t_len) / OS_SR
    u = (0.05 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    r = 12000 + 8000 * np.sin(2 * np.pi * 5.5 * t)
    gl = 1.0 / np.maximum(r, 1000)

    pp = dkp.make_params(OS_SR)

    def body64(st, xs):
        g, x = xs
        st, y = dkp.step(pp, st, g, x)
        return st, y

    _, y64 = jax.lax.scan(body64, dkp.init_state(pp),
                          (jnp.asarray(gl), jnp.asarray(u, jnp.float64)))
    y64 = np.asarray(y64)

    flat = mc.init_state(BASE_SR, 1)
    st0 = {k: jnp.asarray(v) for k, v in mc.unpack_state(flat).items()}

    def body32(carry, xs):
        st = dict(zip(names, carry))
        g, x = xs
        st, y = mc.preamp_step(carr, sc, st, x.reshape(1, 1),
                               g.reshape(1, 1))
        return tuple(st[n] for n in names), y.ravel()

    _, y32 = jax.lax.scan(jax.jit(body32), tuple(st0[n] for n in names),
                          (jnp.asarray(gl.astype(np.float32)),
                           jnp.asarray(u)))
    err = (np.asarray(y32).ravel() - y64)[200:]
    db = _db(err, y64[200:])
    assert db < -64.0, f"preamp stage parity {db:.1f} dB"


def test_preamp_crest_turn_on_parity():
    """Junction turn-on at the tremolo crest (max shunt R ≈ 34 kΩ): the
    second BJT port crosses into conduction and the twins' COMMON bias
    trajectory gates the event — the regression that caught the
    v_pb_dc[FB]-vs-v_dc[FB] recentering bug (−2.4 dB before the fix)."""
    c, carr, sc, names = _kernel_env()
    t_len = 6000
    t = np.arange(t_len) / OS_SR
    u = (0.12 * (np.sin(2 * np.pi * 220 * t)
                 + 0.5 * np.sin(2 * np.pi * 440 * t))).astype(np.float32)
    # sweep across the crest plateau where the turn-on lives
    r = 31000.0 + 3800.0 * np.sin(2 * np.pi * 5.5 * t)
    gl = 1.0 / np.maximum(r, 1000)

    pp = dkp.make_params(OS_SR)

    def body64(st, xs):
        g, x = xs
        st, y = dkp.step(pp, st, g, x)
        return st, y

    _, y64 = jax.lax.scan(body64, dkp.init_state(pp),
                          (jnp.asarray(gl), jnp.asarray(u, jnp.float64)))
    y64 = np.asarray(y64)

    flat = mc.init_state(BASE_SR, 1)
    st0 = {k: jnp.asarray(v) for k, v in mc.unpack_state(flat).items()}

    def body32(carry, xs):
        st = dict(zip(names, carry))
        g, x = xs
        st, y = mc.preamp_step(carr, sc, st, x.reshape(1, 1),
                               g.reshape(1, 1))
        return tuple(st[n] for n in names), y.ravel()

    _, y32 = jax.lax.scan(jax.jit(body32), tuple(st0[n] for n in names),
                          (jnp.asarray(gl.astype(np.float32)),
                           jnp.asarray(u)))
    err = (np.asarray(y32).ravel() - y64)[400:]
    db = _db(err, y64[400:])
    assert db < -60.0, f"preamp crest turn-on parity {db:.1f} dB"


@pytest.mark.parametrize("amp,gate_db", [(0.05, -70.0), (0.2, -70.0)])
def test_power_amp_stage_parity(amp, gate_db):
    c, carr, sc, names = _kernel_env()
    t_len = 4000
    t = np.arange(t_len) / OS_SR
    env = np.minimum(np.arange(t_len) / 400.0, 1.0)
    u64 = env * amp * np.sin(2 * np.pi * 1000 * t)

    pa = pamod.make_params(OS_SR)

    def body64(st, x):
        st, y = pamod.step(pa, st, x, rail_sag=True)
        return st, y

    _, y64 = jax.lax.scan(body64, pamod.init_state(pa), jnp.asarray(u64))
    y64 = np.asarray(y64)

    flat = mc.init_state(BASE_SR, 1)
    st0 = {k: jnp.asarray(v) for k, v in mc.unpack_state(flat).items()}

    def body32(carry, x):
        st = dict(zip(names, carry))
        st, y = mc.pa_step(carr, sc, st, x.reshape(1, 1),
                           jnp.ones((1, 1), jnp.float32))
        return tuple(st[n] for n in names), y.ravel()

    _, y32 = jax.lax.scan(jax.jit(body32), tuple(st0[n] for n in names),
                          jnp.asarray(u64, jnp.float32))
    err = (np.asarray(y32).ravel() - y64)[500:]
    db = _db(err, y64[500:])
    assert db < gate_db, f"power amp parity {db:.1f} dB at amp={amp}"


def test_tremolo_subsampled_parity():
    """Subsampled kernel tremolo vs per-sample f64: the shunt trajectory
    must agree within 2 % and preserve the oscillation rate."""
    c, carr, sc, names = _kernel_env()
    n_upd = 3000  # × TREM_SUB_OS os-samples ≈ 0.27 s

    tp = trmod.make_params(OS_SR)
    st64 = trmod.init_state(OS_SR)

    def body64(st, _):
        st, shunt = trmod.step(tp, st, 0.5)
        return st, shunt

    _, shunt64 = jax.lax.scan(body64, st64, None,
                              length=n_upd * mc.TREM_SUB_OS)
    shunt64 = np.asarray(shunt64)[mc.TREM_SUB_OS - 1::mc.TREM_SUB_OS]

    flat = mc.init_state(BASE_SR, 1)
    st0 = {k: jnp.asarray(v) for k, v in mc.unpack_state(flat).items()}
    ctrl = mc.make_controls(BASE_SR, 1, depth=0.5)
    cc = dict(carr)
    cc.update({k: jnp.asarray(v) for k, v in
               mc.unpack_controls(ctrl).items()})

    def body32(carry, _):
        st = dict(zip(names, carry))
        st = mc.trem_update(cc, sc, st)
        return tuple(st[n] for n in names), 1.0 / st["gldr_cur"].ravel()

    _, shunt32 = jax.lax.scan(jax.jit(body32),
                              tuple(st0[n] for n in names), None,
                              length=n_upd)
    shunt32 = np.asarray(shunt32).ravel()
    # skip the settling mismatch of the first few cycles
    s64 = shunt64[n_upd // 2:]
    s32 = shunt32[n_upd // 2:]
    rel = np.abs(s32 - s64) / np.abs(s64)
    assert np.median(rel) < 0.02, f"median shunt deviation {np.median(rel)}"
    # oscillation rate via mean-crossing count
    m64 = (s64 > s64.mean()).astype(int)
    m32 = (s32 > s32.mean()).astype(int)
    assert abs(np.abs(np.diff(m64)).sum()
               - np.abs(np.diff(m32)).sum()) <= 2


@pytest.mark.slow
@pytest.mark.parametrize("lvl,rel_gate,abs_gate", [
    (0.02, -40.0, -85.0),
    (0.1, -36.0, -59.0),
])
def test_full_chain_parity(lvl, rel_gate, abs_gate):
    """render_cpu vs the f64 module chain in engine order.

    At note level (0.02) the chain tracks to −43 dB / −89 dBFS. At loud
    drive (0.1) the output is hypersensitive to the tremolo trajectory:
    the f64 reference against ITSELF with gldr perturbed by 0.1 % moves
    −39 dB (junction turn-on at the tremolo crest is a bifurcation), and
    the kernel's measured −40 dB sits AT that structural sensitivity
    bound — the gate reflects the bound, not an f32 deficiency."""
    c, carr, sc, names = _kernel_env()
    t_len = 8192
    tt = np.arange(t_len) / BASE_SR
    env = np.minimum(np.arange(t_len) / 800.0, 1.0)
    audio = (env * lvl * (np.sin(2 * np.pi * 220 * tt)
                          + 0.5 * np.sin(2 * np.pi * 440 * tt))
             ).astype(np.float32)

    y64 = _f64_chain(audio.astype(np.float64), depth=0.5, volume=0.5,
                     character=0.0)

    ctrl = mc.make_controls(BASE_SR, 1, volume=0.5, depth=0.5,
                            character=0.0)
    flat = mc.init_state(BASE_SR, 1)
    y32, _ = mc.render_cpu(c, ctrl, flat, audio.reshape(-1, 1))
    y32 = np.asarray(y32).ravel()
    err = (y32 - y64)[1000:]
    db = _db(err, y64[1000:])
    err_dbfs = 20.0 * np.log10(max(np.sqrt(np.mean(err**2)), 1e-30))
    assert db < rel_gate, f"full-chain relative parity {db:.1f} dB"
    assert err_dbfs < abs_gate, f"full-chain abs error {err_dbfs:.1f} dBFS"


def _f64_chain(audio, depth, volume, character, gldr_scale=1.0,
               gldr_seq=None):
    """f64 reference: engine.py's mono chain body without voices.

    gldr_scale: multiply the tremolo-derived LDR conductance (for the
    trajectory-sensitivity bound). gldr_seq (T,) — bypass the tremolo
    entirely and drive the preamp with this conductance per base sample
    (both oversampled sub-samples see the same value; the fixed-
    trajectory comparison mode)."""
    pp = dkp.make_params(OS_SR)
    tp = trmod.make_params(OS_SR)
    pa = pamod.make_params(OS_SR)
    spk_params = spkmod.make_params(BASE_SR)
    coeffs = spkmod.coeffs_for_character(character, BASE_SR)

    use_seq = gldr_seq is not None
    xs = (jnp.asarray(audio),
          jnp.asarray(gldr_seq if use_seq else np.zeros(len(audio))))

    def body(carry, xg):
        x, gs = xg
        os_st, trem, pre, pa_st, spk = carry
        os_st, (e, o) = allpass.up_step(os_st, x)
        ys = []
        for u in (e, o):
            if use_seq:
                g_ldr = gs
            else:
                trem, shunt = trmod.step(tp, trem, depth)
                g_ldr = dkp.ldr_conductance(shunt) * gldr_scale
            pre, pre_out = dkp.step(pp, pre, g_ldr, u)
            pa_st, y = pamod.step(pa, pa_st, pre_out * 0.25, rail_sag=True)
            ys.append(y)
        os_st, amp_out = allpass.down_step(os_st, ys[0], ys[1])
        spk, shaped = spkmod.step(spk_params, spk, coeffs, amp_out)
        from openwurli_tpu import tables

        return (os_st, trem, pre, pa_st, spk), (
            shaped * tables.POST_SPEAKER_GAIN * volume)

    carry0 = (allpass.init_state(), trmod.init_state(OS_SR),
              dkp.init_state(pp), pamod.init_state(pa), spkmod.init_state())
    _, y = jax.lax.scan(body, carry0, xs)
    return np.asarray(y)


def _loud_test_signal(t_len=8192, lvl=0.1):
    tt = np.arange(t_len) / BASE_SR
    env = np.minimum(np.arange(t_len) / 800.0, 1.0)
    return (env * lvl * (np.sin(2 * np.pi * 220 * tt)
                         + 0.5 * np.sin(2 * np.pi * 440 * tt))
            ).astype(np.float32)


@pytest.mark.slow
def test_full_chain_gldr_sensitivity_bound():
    """COMMITTED measurement of the bound the −40 dB loud-drive gate
    leans on: the f64 chain against ITSELF with the LDR conductance
    perturbed by 0.1 % moves ≈−39 dB at loud drive (junction turn-on at
    the tremolo crest is a bifurcation — hypersensitivity to the
    trajectory, not an f32 deficiency). The band fails if a tremolo or
    preamp change silently voids the bound in either direction."""
    audio = _loud_test_signal().astype(np.float64)
    y = _f64_chain(audio, depth=0.5, volume=0.5, character=0.0)
    yp = _f64_chain(audio, depth=0.5, volume=0.5, character=0.0,
                    gldr_scale=1.001)
    db = _db((yp - y)[1000:], y[1000:])
    assert -44.0 < db < -34.0, f"sensitivity bound moved: {db:.1f} dB"


@pytest.mark.slow
def test_full_chain_parity_fixed_trajectory():
    """Full chain f32-vs-f64 with the tremolo trajectory BIT-MATCHED
    (an identical f32-representable LDR-conductance sweep drives both
    paths, spanning the full 4–20 kΩ shunt range): with trajectory
    divergence removed, the kernel tracks the f64 chain to −61 dB
    relative / −64 dBFS at loud drive — 21 dB past the −40 dB
    trajectory-dominated headline gate. Round-5 floor work (measured
    attribution in tools/pa_floor_probe.py): the limiter was the
    preamp's pump-scale (±80 V) pb accumulation, whose 4 FMA roundings
    at ulp ≈ 6 µV seeded event-concentrated errors the power amp
    amplified; the compensated (Dekker + TwoSum) accumulation in
    kernels/mono_chain.py removes them in pure f32 (f64 oracle:
    −63.5 dB)."""
    t_len = 8192
    audio = _loud_test_signal(t_len)
    r = 12000 + 8000 * np.sin(2 * np.pi * 5.5 * np.arange(t_len) / BASE_SR)
    g = (1.0 / np.maximum(r, 1000.0)).astype(np.float32)

    y64 = _f64_chain(audio.astype(np.float64), depth=0.5, volume=0.5,
                     character=0.0, gldr_seq=g.astype(np.float64))

    c, carr, sc, names = _kernel_env()
    ctrl = mc.make_controls(BASE_SR, 1, volume=0.5, depth=0.5,
                            character=0.0)
    cc = dict(carr)
    cc.update({k: jnp.asarray(v) for k, v in
               mc.unpack_controls(jnp.asarray(ctrl)).items()})
    flat = mc.init_state(BASE_SR, 1)
    st0 = {k: jnp.asarray(v)
           for k, v in mc.unpack_state(jnp.asarray(flat)).items()}

    def body32(carry, xg):
        x, gv = xg
        st = dict(zip(names, carry))
        # pin the interpolated tremolo line to the injected value
        st["gldr_cur"] = jnp.full_like(st["gldr_cur"], gv)
        st["gldr_upd_prev"] = jnp.full_like(st["gldr_upd_prev"], gv)
        st["trem_phase"] = jnp.zeros_like(st["trem_phase"])
        st, y = mc.base_step(cc, sc, st, x.reshape(1, 1))
        return tuple(st[n] for n in names), y.ravel()

    _, y32 = jax.lax.scan(jax.jit(body32), tuple(st0[n] for n in names),
                          (jnp.asarray(audio), jnp.asarray(g)))
    err = (np.asarray(y32).ravel() - y64)[1000:]
    db = _db(err, y64[1000:])
    err_dbfs = 20.0 * np.log10(max(np.sqrt(np.mean(err**2)), 1e-30))
    assert db < -60.0, f"fixed-trajectory parity {db:.1f} dB"
    assert err_dbfs < -62.0, f"fixed-trajectory abs {err_dbfs:.1f} dBFS"
