"""Closed-form GP derivatives vs autodiff of the reference current fns."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openwurli_tpu.circuits import gp, mna, power_amp, tremolo


def _check_netlist(nl, v_scale=0.7, n_pts=64, seed=0):
    rng = np.random.default_rng(seed)
    m = nl.dims()[1]
    v = jnp.asarray(rng.uniform(-v_scale, v_scale, size=(n_pts, m)))

    fn = nl.device_current_fn()
    jac_ad = jax.vmap(jax.jacfwd(fn))(v)
    jac_an = gp.analytic_device_jacobian_fn(nl)(v)

    scale = np.maximum(np.abs(np.asarray(jac_ad)), 1e-12)
    rel = np.abs(np.asarray(jac_an) - np.asarray(jac_ad)) / scale
    assert rel.max() < 1e-9, f"max rel dev {rel.max():.3e}"

    # Currents from the packed path must match mna.bjt_currents exactly.
    for b, (_, _, _, _, model, _s) in enumerate(nl.bjts):
        pk = {k: val for k, val in zip(
            gp.PARAM_NAMES, gp.pack_bjt_params([model], np.float64)[0])}
        ib, ic, *_ = gp.bjt_currents_derivs_packed(
            pk, v[:, 2 * b], v[:, 2 * b + 1])
        ib_ref, ic_ref = mna.bjt_currents(model, v[:, 2 * b], v[:, 2 * b + 1])
        np.testing.assert_allclose(np.asarray(ib), np.asarray(ib_ref),
                                   rtol=1e-12, atol=0)
        np.testing.assert_allclose(np.asarray(ic), np.asarray(ic_ref),
                                   rtol=1e-12, atol=0)


def test_power_amp_jacobian():
    _check_netlist(power_amp.build_netlist())


def test_tremolo_jacobian():
    _check_netlist(tremolo.build_netlist())


def test_melange_preamp_jacobian():
    from openwurli_tpu.circuits import melange_preamp

    _check_netlist(melange_preamp.build_netlist())


def test_large_bias_region():
    """Hard-clip region: vbe/vbc excursions past the limexp switch."""
    nl = power_amp.build_netlist()
    _check_netlist(nl, v_scale=3.0, seed=1)


def test_diode_deriv():
    d = mna.DiodeModel(is_=2e-15, n=1.8)
    v = jnp.linspace(-2.0, 1.0, 101)
    i, g = gp.diode_current_deriv(d, v)
    i_ref = mna.diode_current(d, v)
    np.testing.assert_allclose(np.asarray(i), np.asarray(i_ref), rtol=1e-12)
    g_ad = jax.vmap(jax.grad(lambda x: mna.diode_current(d, x)))(v)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), rtol=1e-9)
