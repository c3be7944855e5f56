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
