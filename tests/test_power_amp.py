"""Power-amp tests — ports of the reference behavioral gates + rail sag."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openwurli_tpu.circuits import mna, power_amp as pa

pytestmark = pytest.mark.slow  # multi-minute end-to-end renders on 1-core CPU

SR = 44100.0  # the reference's power-amp test rate


@functools.lru_cache(maxsize=None)
def _params(sr=SR):
    return pa.make_params(sr)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _run(st, xs, sag, sr):
    params = _params(sr)

    def body(s, x):
        return pa.step(params, s, x, rail_sag=sag)

    return jax.lax.scan(body, st, xs)


def _gain_db(freq, amp, sr=SR, settle=0.3, measure=0.1):
    params = _params(sr)
    n = int(sr * (settle + measure))
    t = np.arange(n) / sr
    xs = jnp.asarray(amp * np.sin(2 * np.pi * freq * t))
    _, out = _run(pa.init_state(params), xs, True, sr)
    seg = np.asarray(out)[int(sr * settle):]
    seg = seg - seg.mean()  # AC-couple: remove the small DC output offset
    peak = (seg.max() - seg.min()) / 2
    return 20 * np.log10(peak / amp)


def test_dc_operating_point_sane():
    nl = pa.build_netlist()
    v_dc, i_dc, _ = mna.dc_solve(nl)
    idx = nl._nodes
    # Output offset small, rails at the static bias.
    assert abs(v_dc[idx["out"]]) < 0.5
    assert abs(v_dc[idx["vp"]] - 22.5) < 1e-9
    assert abs(v_dc[idx["vn"]] + 22.5) < 1e-9
    # Vbe-multiplier bias spread ~ 2 diode drops for Class AB.
    spread = v_dc[idx["vas_out"]] - v_dc[idx["drv_bot"]]
    assert 0.9 < spread < 1.5, spread


def test_linearized_closed_loop_gain():
    # Midband closed-loop gain 1 + R31/R30 = 69.2, from the independent
    # complex small-signal solve of our assembled matrices.
    nl = pa.build_netlist()
    asm = nl.assemble()
    v_dc, i_dc, v_nl_dc = mna.dc_solve(nl)
    jdev = np.asarray(jax.jacfwd(nl.device_current_fn())(jnp.asarray(v_nl_dc)))
    g_dev = -asm["n_i"] @ jdev @ asm["n_v"]
    a = asm["g"] + g_dev + 2j * np.pi * 1000.0 * asm["c"]
    b = np.zeros(asm["n"], dtype=complex)
    b[asm["input_row"]] = 1.0
    v = np.linalg.solve(a, b)
    gain = abs(v[nl._nodes["out"]])
    assert 60.0 < gain < 75.0, gain


def test_closed_loop_gain_time_domain():
    gain_db = _gain_db(1000.0, 0.001)
    # 69x / 22V normalization = 3.14x → ~10 dB
    assert 5.0 < gain_db < 20.0, gain_db


def test_rail_clipping():
    params = _params()
    n = int(SR * 0.2)
    t = np.arange(n) / SR
    xs = jnp.asarray(5.0 * np.sin(2 * np.pi * 100.0 * t))
    _, out = _run(pa.init_state(params), xs, True, SR)
    peak = float(jnp.abs(out[int(SR * 0.1):]).max())
    assert 0.85 < peak <= 1.0, peak


def test_crossover_reduced_by_feedback():
    params = _params()
    freq, amp = 440.0, 0.001
    n = int(SR * 0.3)
    t = np.arange(n) / SR
    xs = jnp.asarray(amp * np.sin(2 * np.pi * freq * t))
    _, out = _run(pa.init_state(params), xs, True, SR)
    seg = np.asarray(out)[n // 2:]
    seg = seg - seg.mean()
    ph = 2 * np.pi * freq * np.arange(len(seg)) / SR

    def mag(k):
        return np.hypot((seg * np.cos(k * ph)).mean(),
                        (seg * np.sin(k * ph)).mean())

    h3_db = 20 * np.log10(mag(3) / mag(1))
    assert h3_db < -30.0, h3_db


def test_output_bounded():
    params = _params()
    for level in [0.0, 0.01, 0.5, 5.0, -5.0]:
        xs = jnp.full(200, level, dtype=jnp.float64)
        _, out = _run(pa.init_state(params), xs, True, SR)
        o = np.asarray(out)
        assert np.isfinite(o).all()
        assert (np.abs(o) <= 1.0).all()


# ── Rail dynamics (pure unit tests of the behavioral model) ─────────────


def test_rail_dynamics_idle_recovery():
    params = _params()
    rails = pa.init_rails()
    assert abs(float(rails.v_rail_pos) - 22.5) < 1e-9

    @jax.jit
    def run_rails(r, v_out, n):
        def body(rr, _):
            return pa.rails_step(params, rr, v_out), None

        return jax.lax.scan(body, r, None, length=11025)[0]

    rails = run_rails(rails, jnp.asarray(0.0), None)
    assert abs(float(rails.v_rail_pos) - 24.5) < 0.05

    # 1 A sustained load on the + rail → target 24.5 − 3.5 = 21.0 V
    def body(rr, _):
        return pa.rails_step(params, rr, jnp.asarray(8.0)), None

    rails = jax.lax.scan(body, rails, None, length=int(SR * 0.3))[0]
    assert abs(float(rails.v_rail_pos) - 21.0) < 0.1
    assert abs(float(rails.v_rail_neg) - 24.5) < 0.05


def test_rail_sag_under_sustained_load():
    params = _params()
    n = int(SR * 0.5)
    t = np.arange(n) / SR
    # ~200 mV sine → ~14 V out → real load current → visible sag
    xs = jnp.asarray(0.20 * np.sin(2 * np.pi * 220.0 * t))
    st, _ = _run(pa.init_state(params), xs, True, SR)
    vp = float(st.rails.v_rail_pos)
    assert vp < 24.4, vp
    assert vp > 20.0, vp


def test_behavioral_model_gain_and_clip():
    g = float(pa.behavioral_process(jnp.asarray(0.001))) * pa.HEADROOM / 0.001
    assert 60.0 < g < 75.0
    y = float(pa.behavioral_process(jnp.asarray(5.0)))
    assert 0.85 < y <= 1.0


def test_batched_instances():
    params = _params()
    n = 400
    t = np.arange(n) / SR
    sine = 0.001 * np.sin(2 * np.pi * 1000.0 * t)
    xs = jnp.asarray(np.stack([sine, 2 * sine], axis=1))
    st = pa.init_state(params, batch_shape=(2,))

    def body(s, x):
        return pa.step(params, s, x, rail_sag=True)

    _, out = jax.lax.scan(body, st, xs)
    o = np.asarray(out)
    assert o.shape == (n, 2)
    assert np.isfinite(o).all()
    a0 = np.abs(o[n // 2:, 0] - o[n // 2:, 0].mean()).max()
    a1 = np.abs(o[n // 2:, 1] - o[n // 2:, 1].mean()).max()
    assert 1.5 < a1 / a0 < 2.5  # linear region: 2x input → 2x output
