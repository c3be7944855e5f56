"""Fast end-to-end gates for the CI quick profile (-m "not slow").

Small-shape versions of the decisive fused-path checks — the full-size
variants are `slow` (round-2 verdict: an end-to-end fused-kernel or
tonal regression must be able to fail CI):
  1. full-chain kernel-twin vs f64 module chain (2048 samples);
  2. voice-bank kernel vs the f64 scan at −60 dB (one voice);
  3. a tonal anchor: H1–H6 of a note-72 render through voice kernel +
     chain against committed golden values (catches tonal drift
     anywhere in the pipeline: tables, voice, pickup, preamp, PA,
     speaker, gains).
"""

import numpy as np
import jax.numpy as jnp

from openwurli_tpu import tables, voice
from openwurli_tpu.calib import goertzel
from openwurli_tpu.kernels import mono_chain as mc
from openwurli_tpu.kernels import voice_bank as vb

from test_mono_chain import _db, _f64_chain, _kernel_env, BASE_SR

# Golden H1-H6 (dB re 1.0) of note 72 v=120: 6144-sample render, window
# [2048:6144], engine controls volume=0.5/depth=0.5/character=0.
# H6 sits ~47 dB below H1, near the kernel's f32 rounding floor: an
# ulp-level arithmetic reorder in the voice kernel (round 4's group
# restructure) moved it 7 dB while H1-H5 held — its band is wide
# because it anchors "still buried", not a precise level.
TONAL_GOLDEN_DB = [-54.396, -60.032, -69.685, -81.232, -95.447, -101.946]
TONAL_TOL_DB = [1.0, 1.0, 1.0, 1.5, 3.0, 10.0]


def test_quick_full_chain_parity():
    c, carr, sc, names = _kernel_env()
    t_len = 2048
    tt = np.arange(t_len) / BASE_SR
    env = np.minimum(np.arange(t_len) / 400.0, 1.0)
    audio = (env * 0.05 * (np.sin(2 * np.pi * 220 * tt)
                           + 0.5 * np.sin(2 * np.pi * 440 * tt))
             ).astype(np.float32)
    y64 = _f64_chain(audio.astype(np.float64), depth=0.5, volume=0.5,
                     character=0.0)
    ctrl = mc.make_controls(BASE_SR, 1, volume=0.5, depth=0.5,
                            character=0.0)
    flat = mc.init_state(BASE_SR, 1)
    y32, _ = mc.render_cpu(c, ctrl, flat, audio.reshape(-1, 1))
    db = _db((np.asarray(y32).ravel() - y64)[400:], y64[400:])
    assert db < -45.0, f"quick full-chain parity {db:.1f} dB"


def test_quick_voice_kernel_parity():
    n = 4096
    params, n_active = vb.make_kernel_params([69.0], [0.8], BASE_SR)
    out_k = np.asarray(vb.render_voice_bank(params, n, True))[:, 0]
    out_ref = np.asarray(voice.render_note(
        jnp.asarray([69.0]), jnp.asarray([0.8]), n / BASE_SR, BASE_SR))[:, 0]
    peak = np.abs(out_ref).max()
    err_db = 20 * np.log10(max(np.abs(out_k - out_ref).max(), 1e-300)
                           / peak)
    assert err_db < -60.0, f"quick voice kernel parity {err_db:.1f} dB"


def test_quick_tonal_anchor():
    c, carr, sc, names = _kernel_env()
    ctrl = mc.make_controls(BASE_SR, 1, volume=0.5, depth=0.5,
                            character=0.0)
    flat = mc.init_state(BASE_SR, 1)
    T = 6144
    params, _ = vb.make_kernel_params([72.0], [120 / 127.0], BASE_SR)
    voices = np.asarray(vb.render_voice_bank(params, T, True))[:, :1]
    out, _st = mc.render_cpu(c, ctrl, flat, voices.astype(np.float32))
    seg = jnp.asarray(np.asarray(out).ravel()[2048:6144])
    f0 = float(np.asarray(tables.midi_to_freq(jnp.asarray(72.0))))
    _f0r, amps = goertzel.harmonic_ladder(seg, f0, BASE_SR, n_harmonics=6)
    hs = 20 * np.log10(np.maximum(np.asarray(amps).ravel(), 1e-12))
    for h, (got, want, tol) in enumerate(
            zip(hs, TONAL_GOLDEN_DB, TONAL_TOL_DB), start=1):
        assert abs(got - want) < tol, (
            f"H{h} drifted: {got:.2f} dB vs golden {want:.2f} (tol {tol})")


def test_trem_preroll_matches_serial_updates():
    """The tremolo pre-roll kernel's captures equal serially applied
    trem_update states (the time-parallel renderer's correctness hinges
    on this: captured state entering sample k*stride, pre-update)."""
    import jax
    import jax.numpy as jnp

    from openwurli_tpu.kernels import mono_chain as mc

    sr = 44100.0
    mc.pack_consts(sr)
    ctrl = mc.make_controls(sr, 1, volume=0.5, depth=0.5)
    rows, caps = mc.trem_preroll(sr, ctrl, n_captures=3, capture_stride=64,
                                 interpret=True)
    with jax.enable_x64(False):
        consts = mc.pack_consts(sr)
        c, sc = mc._merged_consts(consts, jnp.asarray(ctrl)[:, :1])
        st = mc.unpack_state(jnp.asarray(mc.init_state(sr, 1), jnp.float32))
        stt = {n: st[n] for n in mc.TREM_STATE}
        for k in range(3):
            ref = np.concatenate(
                [np.asarray(stt[n])[:, 0] for n in mc.TREM_STATE])
            np.testing.assert_allclose(caps[k], ref, atol=5e-6)
            for _ in range(64 // mc.SUB_BASE):
                stt = mc.trem_update(c, sc, stt)
