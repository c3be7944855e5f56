"""Tremolo tests — ports of the reference behavioral gates.

Gates from tremolo.rs tests + dk_preamp/mod.rs cross-implementation tests:
oscillator rate 4.5-7.5 Hz, shunt ranges, depth monotonicity, asymmetric
envelope, reset survival.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openwurli_tpu.circuits import mna, tremolo

pytestmark = pytest.mark.slow  # multi-minute end-to-end renders on 1-core CPU

SR = 44100.0


@functools.lru_cache(maxsize=None)
def _shunt_trace(depth, seconds=2.0, warmup=0.0, sr=SR):
    params = tremolo.make_params(sr)
    state = tremolo.init_state(sr)

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(st, n):
        def body(s, _):
            return tremolo.step(params, s, depth)

        return jax.lax.scan(body, st, None, length=n)

    if warmup:
        state, _ = run(state, int(sr * warmup))
    _, shunt = run(state, int(sr * seconds))
    return np.asarray(shunt)


def test_dc_operating_point_matches_reference_solver():
    # gen_tremolo.rs DC_OP (node order: out, node_hp, base3, node_lp,
    # emit3, vcc, I(V1)) — our independent MNA solve must agree.
    v_dc, _, _ = mna.dc_solve(tremolo.build_netlist())
    expected = [4.26480458, 0.0, 1.24642301, 2.75561286, 0.66651898,
                15.0, -0.00228408]
    np.testing.assert_allclose(v_dc, expected, atol=2e-4)


def test_oscillator_frequency():
    values = _shunt_trace(1.0)
    mean = values.mean()
    crossings = ((values[:-1] < mean) & (values[1:] >= mean)).sum()
    # ~5.3-5.6 Hz over 2 s → ~11 crossings
    assert 8 <= crossings <= 14, f"{crossings} crossings in 2 s"


def test_oscillator_swing_matches_validation():
    # Twin-T output swing from the reference's ngspice validation.
    sr = SR
    params = tremolo.make_params(sr)
    st = tremolo.settled_osc_state(sr)
    step = tremolo._osc_step_fn(sr)
    w0 = jnp.zeros_like(params.solver.w)

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(st, n):
        def body(s, _):
            s, v = step(s, w0)
            return s, v[params.out_idx]

        return jax.lax.scan(body, st, None, length=n)

    _, vout = run(st, int(sr * 2))
    v = np.asarray(vout)
    assert abs(v.min() - tremolo.V_OUT_MIN) < 0.15, v.min()
    assert abs(v.max() - tremolo.V_OUT_MAX) < 0.15, v.max()


def test_depth_zero_is_static():
    values = _shunt_trace(0.0, seconds=0.5)
    range_db = 20 * np.log10(values.max() / values.min())
    assert range_db < 20.0


def test_resistance_range():
    values = _shunt_trace(1.0)
    assert 5_000.0 < values.min() < 15_000.0, values.min()
    assert 25_000.0 < values.max() < 80_000.0, values.max()


def test_depth_swing_monotonic():
    swings = []
    for depth in [0.25, 0.50, 0.75, 1.00]:
        v = _shunt_trace(depth, seconds=1.0, warmup=1.0)
        swings.append(np.log10(v.max() / v.min()))
    for s0, s1 in zip(swings, swings[1:]):
        assert s1 >= s0 - 0.02, swings


def test_asymmetric_envelope():
    values = _shunt_trace(1.0, seconds=1.0)
    mean = values.mean()
    above = (values > mean).sum()
    below = len(values) - above
    # Fast attack + slow release → resistance spends more time low.
    assert below > above


def test_oscillator_survives_reinit():
    # Re-initialising (the host-reset path) must not park the oscillator at
    # its unstable DC equilibrium (the reference's dead-tremolo bug).
    values = _shunt_trace(1.0, seconds=2.0)
    swing_db = 20 * np.log10(values.max() / values.min())
    assert swing_db > 6.0


@pytest.mark.slow
def test_am_depth_and_rate_through_preamp_loop():
    """Reference cross-solver gate (dk_preamp/mod.rs:243-327): measured
    AM depth 4-8 dB AND oscillation rate 4.5-7.5 Hz through the full
    tremolo -> LDR -> preamp loop at depth 1.0."""
    import jax
    import jax.numpy as jnp

    from openwurli_tpu.circuits import dk_preamp as dk

    sr = 88_200.0
    tp = tremolo.make_params(sr)
    pp = dk.make_params(sr)
    n = int(sr * 2.5)
    t = np.arange(n) / sr
    xs = jnp.asarray(0.01 * np.sin(2 * np.pi * 1000.0 * t))

    @jax.jit
    def run(xs):
        def body(carry, x):
            trem, pre = carry
            trem, shunt = tremolo.step(tp, trem, 1.0)
            pre, y = dk.step(pp, pre, dk.ldr_conductance(shunt), x)
            return (trem, pre), y

        carry = (tremolo.init_state(sr), dk.init_state(pp))
        return jax.lax.scan(body, carry, xs)[1]

    out = np.asarray(run(xs))[int(sr * 0.5):]
    win = int(sr * 0.02)
    env = np.sqrt(
        (out[: len(out) // win * win].reshape(-1, win) ** 2).mean(axis=1))
    env_db = 20 * np.log10(env + 1e-12)
    depth = env_db.max() - env_db.min()
    assert 4.0 <= depth <= 8.0, f"AM depth {depth:.2f} dB outside 4-8"

    mid = (env_db.max() + env_db.min()) / 2
    above = env_db > mid
    crossings = np.abs(np.diff(above.astype(int))).sum()
    rate = crossings / 2 / (len(env_db) * win / sr)
    assert 4.5 <= rate <= 7.5, f"tremolo rate {rate:.2f} Hz outside 4.5-7.5"
