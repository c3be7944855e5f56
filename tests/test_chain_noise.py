"""Thermal noise on the FUSED chain (kernels/mono_chain.py preamp_step).

Round-4 verdict Missing #5: authentic_noise/noise_level were inert on
the fast path (the f64 melange engine path had noise; the kernels did
not). These gates pin the in-kernel Johnson-Nyquist model to the same
ngspice anchor the f64 path uses (reference gen_preamp.rs:1439-1563;
test_melange_preamp.py::test_noise_level_matches_ngspice_anchor), and
pin the static-flag contract: a noise=True program at gain 0.0 is
bit-identical to a noise=False program.
"""

import jax
import jax.numpy as jnp
import numpy as np

from openwurli_tpu.kernels import mono_chain as mc

SR = 44100.0  # base rate; the preamp runs 2x-oversampled = 88.2 kHz,
#               the rate of the reference's ngspice noise validation


def _preamp_noise_rms(gain, seconds=0.5, streams=8):
    """Scan preamp_step alone at the nominal 100 kOhm LDR point with
    silence input and the given runtime noise gain; returns the RMS of
    the stage output (the main-minus-shadow OUT-node deviation)."""
    consts = mc.pack_consts(SR)
    ctrl = mc.make_controls(SR, streams, noise_level=gain)
    c, sc = mc._merged_consts(consts, ctrl)
    st0 = mc.unpack_state(jnp.asarray(mc.init_state(SR, streams)))
    g = jnp.full((1, streams), 1.0 / 100_000.0, jnp.float32)
    u = jnp.zeros((1, streams), jnp.float32)
    names = [n for n, _ in mc.STATE_SPEC]

    def body(carry, _):
        st = dict(zip(names, carry))
        st, out = mc.preamp_step(c, sc, st, u, g, noise=True)
        return tuple(st[n] for n in names), out

    n = int(2 * SR * seconds)
    _, outs = jax.lax.scan(body, tuple(st0[n_] for n_ in names), None,
                           length=n)
    o = np.asarray(outs)[n // 3:, 0, :]
    return float(np.sqrt(((o - o.mean(0)) ** 2).mean()))


def test_fused_noise_rms_matches_ngspice_anchor():
    """8.08 uV output RMS at 88.2 kHz / 100 kOhm LDR is the reference's
    ngspice-validated level (reference CHANGELOG.md:479-488). The fused
    kernel's independent 8-node stamp measures 10.2 uV (+26 %); the
    +-40 % band fails on any mis-scaled noise stamp (wrong sqrt, kT
    factor, per-resistor sigma, or a dropped source) while tolerating
    the DK-vs-12-node topology-reduction difference (the f64 melange
    path reads 7.54 uV on the same anchor)."""
    rms = _preamp_noise_rms(1.0)
    assert 8.08e-6 * 0.60 < rms < 8.08e-6 * 1.40, rms


def test_fused_noise_gain_scales():
    """Same band as the f64 path's gate (the junction NR compresses
    slightly at 4x drive there too)."""
    r1 = _preamp_noise_rms(1.0, seconds=0.2)
    r4 = _preamp_noise_rms(4.0, seconds=0.2)
    assert 3.0 < r4 / r1 < 5.3, (r1, r4)


def test_noise_gain_zero_bit_identical():
    """A noise=True program with gain 0.0 injects exact 0.0 everywhere:
    output AND carried state match the noise=False program bit for bit
    (the contract that lets FastEngine zero the gain live instead of
    recompiling)."""
    consts = mc.pack_consts(SR)
    ctrl = mc.make_controls(SR, 2, noise_level=0.0)
    state = mc.init_state(SR, 2)
    t = 256
    rng = np.random.default_rng(0)
    audio = (0.01 * rng.normal(size=(t, 2))).astype(np.float32)
    out_a, st_a = mc.render_cpu(consts, ctrl, state, audio)
    out_b, st_b = mc.render_cpu(consts, ctrl, state, audio, noise=True)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    # noise state rows advance (the LCG runs) but everything else must
    # be identical
    for name, (a, b) in mc._OFFSETS.items():
        if name.startswith("nz_"):
            continue
        np.testing.assert_array_equal(np.asarray(st_a)[a:b],
                                      np.asarray(st_b)[a:b], err_msg=name)


def test_noise_streams_decorrelated():
    """Per-stream RNG seeding: streams' noise must not correlate.

    Measured at the preamp stage, FIRST-DIFFERENCED, at 8x gain. The
    gain matters: at 1x, the stage output in this silent-input regime
    is roughly half physics and half the chain's f32 quantization floor
    — the injected uV-scale perturbation is comparable to the ulp of
    the large-node arithmetic, so the deterministic rounding pattern is
    nearly IDENTICAL across streams (measured r = 0.5 between streams
    AND between runs with different seeds; the draws themselves are
    bit-verified independent). At 8x the physical noise (~44 uV)
    dominates the fixed ~7 uV quant floor and the estimate converges
    (measured r: 0.50 / 0.17 / 0.06 / 0.02 at gains 1/4/8/16). The
    first-difference removes the slow rectification-induced DC settle.
    Detection power: a seed collision between two streams measures
    r = 1.0 here."""
    consts = mc.pack_consts(SR)
    ctrl = mc.make_controls(SR, 4, noise_level=8.0)
    c, sc = mc._merged_consts(consts, ctrl)
    st0 = mc.unpack_state(jnp.asarray(mc.init_state(SR, 4)))
    g = jnp.full((1, 4), 1.0 / 100_000.0, jnp.float32)
    u = jnp.zeros((1, 4), jnp.float32)
    names = [n for n, _ in mc.STATE_SPEC]

    def body(carry, _):
        st = dict(zip(names, carry))
        st, out = mc.preamp_step(c, sc, st, u, g, noise=True)
        return tuple(st[n] for n in names), out

    n = 16384
    _, outs = jax.lax.scan(body, tuple(st0[n_] for n_ in names), None,
                           length=n)
    o = np.asarray(outs)[n // 4:, 0, :]
    d = np.diff(o, axis=0)
    cc = np.corrcoef(d.T)
    off = cc[~np.eye(4, dtype=bool)]
    assert np.abs(off).max() < 0.15, cc


def test_fast_path_noise_smoke():
    """fast.render_chord with noise_level wired end-to-end (interpret
    kernels): noisy render differs from the noiseless one and stays
    finite; noise_level=0 falls back to the noise-free program."""
    from openwurli_tpu import fast

    sr = 8000.0
    quiet = fast.render_chord([60.0], 0.0, 0.12, sr, interpret=True,
                              t_tile=32)
    noisy = fast.render_chord([60.0], 0.0, 0.12, sr, interpret=True,
                              t_tile=32, noise_level=30.0)
    assert np.isfinite(noisy).all()
    d = noisy - quiet
    assert np.abs(d).max() > 0.0
    # 30x gain on a silent render: audible noise floor, not a blow-up
    assert np.abs(noisy).max() < 0.1
