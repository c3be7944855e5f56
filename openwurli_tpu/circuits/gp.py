"""Closed-form Gummel-Poon currents AND derivatives (batched, pure jnp).

The reference's generated solvers carry hand-derived GP derivative code
(gen_power_amp.rs Newton kernels); round-1 recovered Jacobians with two
jax.jvp tangent passes per NR iteration, which re-traces the full current
function twice per iteration — the dominant cost of the power-amp stage.
This module provides the analytic derivatives directly: one evaluation
yields currents and all four block entries of each BJT's 2×2 Jacobian.

Exactly matches mna.bjt_currents / mna.diode_current (same limexp safeguard,
same q1 clip, same max(q2, 0)); validated against jax.jacfwd of those
functions in tests/test_gp.py.

Also exports a packed, dtype-generic layout (`pack_bjt_params` +
`bjt_currents_derivs_packed`) used by the fused Pallas kernel, where the 8
power-amp BJTs evaluate as (8, S) vector ops with per-BJT constants in
(8, 1) columns.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from openwurli_tpu.circuits import mna

_XC = 40.0
_EXC = float(np.exp(_XC))

# Packed parameter rows (pack_bjt_params column order)
PARAM_NAMES = (
    "is_", "inv_nfvt", "inv_nrvt", "inv_vaf", "inv_var", "inv_ikf",
    "inv_ikr", "ise", "inv_nevt", "isc", "inv_ncvt", "inv_bf", "inv_br",
)
N_PARAMS = len(PARAM_NAMES)


def _limexp_d(x):
    """limexp and its derivative (both continuous at the switch)."""
    e = jnp.exp(jnp.minimum(x, _XC))
    val = jnp.where(x < _XC, e, _EXC * (1.0 + (x - _XC)))
    dval = jnp.where(x < _XC, e, _EXC)
    return val, dval


def _inv_or_zero(x):
    return 0.0 if np.isinf(x) else 1.0 / x


def pack_bjt_params(models, dtype=np.float32):
    """models: sequence of mna.BjtModel → (n_bjt, N_PARAMS) array."""
    rows = []
    for m in models:
        rows.append([
            m.is_,
            1.0 / (m.nf * m.vt),
            1.0 / (m.nr * m.vt),
            _inv_or_zero(m.vaf),
            _inv_or_zero(m.var),
            _inv_or_zero(m.ikf),
            _inv_or_zero(m.ikr),
            m.ise,
            1.0 / (m.ne * m.vt),
            m.isc,
            1.0 / (m.nc * m.vt),
            1.0 / m.bf,
            1.0 / m.br,
        ])
    return np.asarray(rows, dtype=dtype)


def bjt_currents_derivs_packed(p, vbe, vbc):
    """Batched GP: p maps PARAM_NAMES → per-BJT columns broadcastable
    against vbe/vbc (e.g. (8, 1) vs (8, S)).

    Returns (ib, ic, dib_be, dib_bc, dic_be, dic_bc) — NPN convention,
    matching mna.bjt_currents exactly.
    """
    is_ = p["is_"]
    ef, def_ = _limexp_d(vbe * p["inv_nfvt"])
    er, der = _limexp_d(vbc * p["inv_nrvt"])
    i_f = is_ * (ef - 1.0)
    i_r = is_ * (er - 1.0)
    dif = is_ * def_ * p["inv_nfvt"]   # d i_f / d vbe
    dir_ = is_ * der * p["inv_nrvt"]   # d i_r / d vbc

    q1_arg = 1.0 - vbc * p["inv_vaf"] - vbe * p["inv_var"]
    clipped = q1_arg < 1e-4
    q1 = 1.0 / jnp.maximum(q1_arg, 1e-4)
    q1sq = q1 * q1
    dq1_be = jnp.where(clipped, 0.0, p["inv_var"] * q1sq)
    dq1_bc = jnp.where(clipped, 0.0, p["inv_vaf"] * q1sq)

    q2 = i_f * p["inv_ikf"] + i_r * p["inv_ikr"]
    q2p = jnp.maximum(q2, 0.0)
    root = jnp.sqrt(1.0 + 4.0 * q2p)
    h = 0.5 * (1.0 + root)
    dh_dq2 = jnp.where(q2 > 0.0, 1.0 / root, 0.0)
    qb = q1 * h
    dqb_be = dq1_be * h + q1 * dh_dq2 * (dif * p["inv_ikf"])
    dqb_bc = dq1_bc * h + q1 * dh_dq2 * (dir_ * p["inv_ikr"])

    inv_qb = 1.0 / qb
    ict = (i_f - i_r) * inv_qb
    dict_be = (dif - ict * dqb_be) * inv_qb
    dict_bc = (-dir_ - ict * dqb_bc) * inv_qb

    el, dle = _limexp_d(vbe * p["inv_nevt"])
    ec, dlc = _limexp_d(vbc * p["inv_ncvt"])
    ibe = i_f * p["inv_bf"] + p["ise"] * (el - 1.0)
    ibc = i_r * p["inv_br"] + p["isc"] * (ec - 1.0)
    dibe_be = dif * p["inv_bf"] + p["ise"] * dle * p["inv_nevt"]
    dibc_bc = dir_ * p["inv_br"] + p["isc"] * dlc * p["inv_ncvt"]

    ib = ibe + ibc
    ic = ict - ibc
    return (ib, ic,
            dibe_be,            # dib/dvbe
            dibc_bc,            # dib/dvbc
            dict_be,            # dic/dvbe
            dict_bc - dibc_bc)  # dic/dvbc


def bjt_currents_packed(p, vbe, vbc):
    """Currents only (final NR evaluation) — same math as the derivs fn."""
    is_ = p["is_"]
    ef, _ = _limexp_d(vbe * p["inv_nfvt"])
    er, _ = _limexp_d(vbc * p["inv_nrvt"])
    i_f = is_ * (ef - 1.0)
    i_r = is_ * (er - 1.0)
    q1 = 1.0 / jnp.maximum(1.0 - vbc * p["inv_vaf"] - vbe * p["inv_var"],
                           1e-4)
    q2 = i_f * p["inv_ikf"] + i_r * p["inv_ikr"]
    qb = q1 * 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * jnp.maximum(q2, 0.0)))
    ict = (i_f - i_r) / qb
    el, _ = _limexp_d(vbe * p["inv_nevt"])
    ec, _ = _limexp_d(vbc * p["inv_ncvt"])
    ibe = i_f * p["inv_bf"] + p["ise"] * (el - 1.0)
    ibc = i_r * p["inv_br"] + p["isc"] * (ec - 1.0)
    return ibe + ibc, ict - ibc


def diode_current_deriv(model: mna.DiodeModel, vd):
    val, dval = _limexp_d(vd / (model.n * model.vt))
    return (model.is_ * (val - 1.0),
            model.is_ * dval / (model.n * model.vt))


def analytic_device_jacobian_fn(netlist: mna.Netlist):
    """Drop-in replacement for Netlist.device_jacobian_fn: dense
    block-diagonal (..., M, M) from closed-form derivatives — one device
    evaluation per call instead of two JVP re-traces."""
    bjts = list(netlist.bjts)
    diodes = list(netlist.diodes)
    n_bjt = len(bjts)
    m = 2 * n_bjt + len(diodes)

    packs = [
        {k: v for k, v in zip(PARAM_NAMES,
                              pack_bjt_params([model], np.float64)[0])}
        for _, _, _, _, model, _sign in bjts
    ]

    # Static masks scattering per-device scalars into the dense (M, M)
    # block-diagonal (no runtime scatters).
    def basis(i, j):
        e = np.zeros((m, m))
        e[i, j] = 1.0
        return e

    def jac(v_nl):
        out = 0.0
        for b, pk in enumerate(packs):
            i0 = 2 * b
            _, _, dib_be, dib_bc, dic_be, dic_bc = (
                bjt_currents_derivs_packed(
                    pk, v_nl[..., i0], v_nl[..., i0 + 1]))
            out = (out
                   + dib_be[..., None, None] * basis(i0, i0)
                   + dib_bc[..., None, None] * basis(i0, i0 + 1)
                   + dic_be[..., None, None] * basis(i0 + 1, i0)
                   + dic_bc[..., None, None] * basis(i0 + 1, i0 + 1))
        for k, (_, _, _, model) in enumerate(diodes):
            idx = 2 * n_bjt + k
            _, g = diode_current_deriv(model, v_nl[..., idx])
            out = out + g[..., None, None] * basis(idx, idx)
        return out

    return jac
