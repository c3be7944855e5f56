"""Generic MNA circuit solver — netlist → DK-method per-sample step.

This is the TPU-native replacement for the reference's melange codegen
(spice/melange/*.cir → generated Rust solvers): a netlist is assembled into
fixed MNA matrices at setup time (NumPy f64), and the per-sample solve runs
as a pure jnp step — trapezoidal or backward-Euler companion integration
with Newton-Raphson on the M-dimensional nonlinear kernel K = N_v S N_i.
Batched over engine instances; device Jacobians come from jax.jacfwd, so
the Gummel-Poon model has no hand-derived derivative code to get wrong.

Supported devices: resistors, capacitors, DC voltage sources (with runtime
offsets, e.g. power-amp rail sag), an input voltage source, NPN/PNP BJTs
(DC Gummel-Poon: NF/NR emission, Early, high-injection, leakage diodes,
finite BR; ohmic RB/RE/RC and junction caps approximated — constant-value
junction caps are stamped as linear capacitors, ohmics omitted as in the
reference's generated solvers), and junction diodes.

Reference behaviours mirrored: NR warm start from the previous sample's
currents, fixed max iterations with convergence masking, NaN reset to the
DC operating point.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

VT_300K = 0.02585126075417566  # kT/q at 300.15 K (SPICE default 27 °C)


@dataclasses.dataclass
class BjtModel:
    """Gummel-Poon parameters (SPICE .model card subset)."""

    is_: float = 1e-14
    bf: float = 100.0
    nf: float = 1.0
    vaf: float = float("inf")
    ikf: float = float("inf")
    ise: float = 0.0
    ne: float = 1.5
    br: float = 1.0
    nr: float = 1.0
    var: float = float("inf")
    ikr: float = float("inf")
    isc: float = 0.0
    nc: float = 2.0
    cje: float = 0.0
    cjc: float = 0.0
    vt: float = VT_300K


@dataclasses.dataclass
class DiodeModel:
    is_: float = 1e-14
    n: float = 1.0
    cj0: float = 0.0
    vt: float = VT_300K


def _limexp(x):
    """Linearised exponential beyond x=40 — SPICE-style NR safeguard."""
    xc = 40.0
    return jnp.where(x < xc, jnp.exp(jnp.minimum(x, xc)),
                     jnp.exp(xc) * (1.0 + (x - xc)))


def solve_f32(a, b):
    """Mixed-precision linear solve: f32 LU factorisation, f64 interface.

    TPU implements LuDecomposition only for f32/c64; Newton iteration with
    an f32-factorised Jacobian and f64 residuals is standard iterative
    refinement — each NR step still contracts the f64 residual, so the
    outer loop converges to full f64 accuracy (a couple of extra
    iterations at worst).
    """
    x = jnp.linalg.solve(a.astype(jnp.float32), b.astype(jnp.float32))
    return x.astype(jnp.float64)


def ge_solve_f32(a, b):
    """Inline unrolled Gaussian elimination (no pivoting), f32 compute.

    a: (..., m, m), b: (..., m) → x: (..., m) in f64. Replaces the
    LuDecomposition custom call inside per-sample scan loops — a custom
    call per sample is catastrophic on TPU, while this unrolls to
    straight-line VPU code. No pivoting: NR Jacobians here are
    I − K·dI/dv with unit-dominant diagonals; the NR outer loop's f64
    residual check catches any pathological solve (iterative refinement).
    """
    m = a.shape[-1]
    aug = jnp.concatenate(
        [a.astype(jnp.float32), b.astype(jnp.float32)[..., None]], axis=-1)
    # Forward elimination, unrolled over static m.
    for k in range(m):
        piv = aug[..., k, k:k + 1]
        inv_piv = 1.0 / jnp.where(jnp.abs(piv) > 1e-30, piv, 1e-30)
        row_k = aug[..., k, :] * inv_piv
        aug = aug.at[..., k, :].set(row_k)
        factors = aug[..., :, k]
        row_idx = jnp.arange(m)
        elim = jnp.where((row_idx > k)[..., None],
                         factors[..., None] * row_k[..., None, :], 0.0)
        aug = aug - elim
    # Back substitution.
    x = [None] * m
    for i in range(m - 1, -1, -1):
        acc = aug[..., i, m]
        for j in range(i + 1, m):
            acc = acc - aug[..., i, j] * x[j]
        x[i] = acc
    return jnp.stack(x, axis=-1).astype(jnp.float64)


def bjt_currents(model: BjtModel, vbe, vbc):
    """DC Gummel-Poon: port voltages (vbe, vbc) → (ib, ic), NPN convention."""
    nf_vt = model.nf * model.vt
    nr_vt = model.nr * model.vt
    i_f = model.is_ * (_limexp(vbe / nf_vt) - 1.0)
    i_r = model.is_ * (_limexp(vbc / nr_vt) - 1.0)

    inv_vaf = 0.0 if np.isinf(model.vaf) else 1.0 / model.vaf
    inv_var = 0.0 if np.isinf(model.var) else 1.0 / model.var
    q1_den = jnp.clip(1.0 - vbc * inv_vaf - vbe * inv_var, 1e-4, None)
    q1 = 1.0 / q1_den

    inv_ikf = 0.0 if np.isinf(model.ikf) else 1.0 / model.ikf
    inv_ikr = 0.0 if np.isinf(model.ikr) else 1.0 / model.ikr
    q2 = i_f * inv_ikf + i_r * inv_ikr
    qb = q1 * 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * jnp.maximum(q2, 0.0)))

    ict = (i_f - i_r) / qb
    ibe = i_f / model.bf + model.ise * (_limexp(vbe / (model.ne * model.vt)) - 1.0)
    ibc = i_r / model.br + model.isc * (_limexp(vbc / (model.nc * model.vt)) - 1.0)
    ic = ict - ibc
    ib = ibe + ibc
    return ib, ic


def diode_current(model: DiodeModel, vd):
    return model.is_ * (_limexp(vd / (model.n * model.vt)) - 1.0)


class Netlist:
    """Circuit builder. Node names are strings; '0' is ground."""

    def __init__(self):
        self.resistors = []  # (n1, n2, ohms)
        self.capacitors = []  # (n1, n2, farads)
        self.vsources = []  # (name, n_plus, n_minus, volts)
        self.bjts = []  # (name, nc, nb, ne, BjtModel, sign)  sign=+1 NPN
        self.diodes = []  # (name, n_plus, n_minus, DiodeModel)
        self.input_node = None
        self._nodes = {}

    def _node(self, name):
        if name in ("0", 0, "gnd", "GND"):
            return -1
        if name not in self._nodes:
            self._nodes[name] = len(self._nodes)
        return self._nodes[name]

    def r(self, n1, n2, ohms):
        self.resistors.append((self._node(n1), self._node(n2), float(ohms)))

    def c(self, n1, n2, farads):
        self.capacitors.append((self._node(n1), self._node(n2), float(farads)))

    def v(self, name, np_, nm, volts):
        self.vsources.append((name, self._node(np_), self._node(nm), float(volts)))

    def bjt(self, name, nc, nb, ne, model: BjtModel, pnp=False):
        self.bjts.append((name, self._node(nc), self._node(nb), self._node(ne),
                          model, -1.0 if pnp else 1.0))
        # Constant-value junction caps (zero-bias CJE/CJC) as linear caps.
        if model.cje:
            self.capacitors.append((self._node(nb), self._node(ne), model.cje))
        if model.cjc:
            self.capacitors.append((self._node(nb), self._node(nc), model.cjc))

    def diode(self, name, np_, nm, model: DiodeModel):
        self.diodes.append((name, self._node(np_), self._node(nm), model))
        if model.cj0:
            self.capacitors.append((self._node(np_), self._node(nm), model.cj0))

    def set_input(self, node):
        """Drive `node` with the per-sample input via an ideal source row."""
        self.input_node = self._node(node)

    # ── assembly ─────────────────────────────────────────────────────────

    @property
    def n_nodes(self):
        return len(self._nodes)

    def dims(self):
        n_vs = len(self.vsources) + (1 if self.input_node is not None else 0)
        n = self.n_nodes + n_vs
        m = 2 * len(self.bjts) + len(self.diodes)
        return n, m

    def assemble(self):
        """Build G, C, w, N_v, N_i, runtime-source row map (all NumPy f64)."""
        n, m = self.dims()
        nn = self.n_nodes
        g = np.zeros((n, n))
        c_mat = np.zeros((n, n))
        w = np.zeros(n)

        def stamp2(mat, i, j, val):
            if i >= 0:
                mat[i, i] += val
            if j >= 0:
                mat[j, j] += val
            if i >= 0 and j >= 0:
                mat[i, j] -= val
                mat[j, i] -= val

        for n1, n2, ohms in self.resistors:
            stamp2(g, n1, n2, 1.0 / ohms)
        for n1, n2, farads in self.capacitors:
            stamp2(c_mat, n1, n2, farads)

        vsrc_rows = {}
        row = nn
        for name, np_, nm_, volts in self.vsources:
            if np_ >= 0:
                g[np_, row] += 1.0
                g[row, np_] += 1.0
            if nm_ >= 0:
                g[nm_, row] -= 1.0
                g[row, nm_] -= 1.0
            w[row] = volts
            vsrc_rows[name] = row
            row += 1
        input_row = None
        if self.input_node is not None:
            g[self.input_node, row] += 1.0
            g[row, self.input_node] += 1.0
            input_row = row
            row += 1

        # Nonlinear ports
        n_v = np.zeros((m, n))
        n_i = np.zeros((n, m))
        port = 0
        for _, nc_, nb_, ne_, model, sign in self.bjts:
            # ports: (vbe, vbc); currents: (ib, ic) in NPN convention
            for node, val in ((nb_, sign), (ne_, -sign)):
                if node >= 0:
                    n_v[port, node] += val
            for node, val in ((nb_, sign), (nc_, -sign)):
                if node >= 0:
                    n_v[port + 1, node] += val
            # ib injection: out of base, into emitter
            for node, val in ((nb_, -sign), (ne_, sign)):
                if node >= 0:
                    n_i[node, port] += val
            # ic injection: out of collector, into emitter
            for node, val in ((nc_, -sign), (ne_, sign)):
                if node >= 0:
                    n_i[node, port + 1] += val
            port += 2
        for _, np_, nm_, model in self.diodes:
            for node, val in ((np_, 1.0), (nm_, -1.0)):
                if node >= 0:
                    n_v[port, node] += val
            for node, val in ((np_, -1.0), (nm_, 1.0)):
                if node >= 0:
                    n_i[node, port] += val
            port += 1

        return dict(g=g, c=c_mat, w=w, n_v=n_v, n_i=n_i,
                    vsrc_rows=vsrc_rows, input_row=input_row, n=n, m=m)

    def device_current_fn(self):
        """Returns f(v_nl (..., M)) → i_nl (..., M), pure jnp."""
        bjts = list(self.bjts)
        diodes = list(self.diodes)

        def fn(v_nl):
            outs = []
            p = 0
            for _, _, _, _, model, _sign in bjts:
                ib, ic = bjt_currents(model, v_nl[..., p], v_nl[..., p + 1])
                outs.extend([ib, ic])
                p += 2
            for _, _, _, model in diodes:
                outs.append(diode_current(model, v_nl[..., p]))
                p += 1
            return jnp.stack(outs, axis=-1)

        return fn

    def device_jacobian_fn(self):
        """Block-structured Jacobian: dI/dV_nl as a dense (..., M, M).

        Each device's currents depend only on ITS OWN port voltages, so
        the Jacobian is block-diagonal (2×2 per BJT, 1×1 per diode). Two
        JVP tangent passes (one per BJT port) recover every block — 8×
        cheaper than jacfwd's M tangents on an M=16 power amp, and the
        dominant cost inside per-sample Newton iterations.
        """
        fn = self.device_current_fn()
        n_bjt = len(self.bjts)
        m = 2 * n_bjt + len(self.diodes)

        # Static masks assembling the dense block-diagonal from the two
        # tangent results by broadcast-multiply (no scatter ops — scalar
        # .at[].set scatters inside per-sample loops are both slow and a
        # Mosaic/XLA-TPU hazard).
        mask1 = np.zeros((m, m))  # columns hit by tangent 1 (vbe / vd)
        mask2 = np.zeros((m, m))  # columns hit by tangent 2 (vbc)
        for b in range(n_bjt):
            i0 = 2 * b
            mask1[i0, i0] = 1.0
            mask1[i0 + 1, i0] = 1.0
            mask2[i0, i0 + 1] = 1.0
            mask2[i0 + 1, i0 + 1] = 1.0
        for k in range(len(self.diodes)):
            idx = 2 * n_bjt + k
            mask1[idx, idx] = 1.0
        # Keep constants as NumPy: this closure is lru-cached and may first
        # run inside a jit trace — jnp constants created there would leak
        # tracers into later traces.
        t1_np = np.zeros(m)
        t1_np[0:2 * n_bjt:2] = 1.0
        t1_np[2 * n_bjt:] = 1.0
        t2_np = np.zeros(m)
        t2_np[1:2 * n_bjt:2] = 1.0

        def jac(v_nl):
            t1 = jnp.broadcast_to(jnp.asarray(t1_np, dtype=v_nl.dtype),
                                  v_nl.shape)
            t2 = jnp.broadcast_to(jnp.asarray(t2_np, dtype=v_nl.dtype),
                                  v_nl.shape)
            _, d1 = jax.jvp(fn, (v_nl,), (t1,))
            _, d2 = jax.jvp(fn, (v_nl,), (t2,))
            # row i, col j: mask1[i,j]·d1[i] + mask2[i,j]·d2[i]
            return (d1[..., :, None] * jnp.asarray(mask1, dtype=v_nl.dtype)
                    + d2[..., :, None] * jnp.asarray(mask2,
                                                     dtype=v_nl.dtype))

        return jac


class SolverParams(NamedTuple):
    """Fixed per-sample-rate solver matrices (static jnp constants)."""

    s: jnp.ndarray        # (n, n) inv(A); A = G + α C (α = 2/T trap, 1/T BE)
    a_hist: jnp.ndarray   # (n, n) history: αC − G (trap) or αC (BE)
    n_v: jnp.ndarray      # (M, n)
    n_i: jnp.ndarray      # (n, M)
    s_ni: jnp.ndarray     # (n, M) = S N_i
    k: jnp.ndarray        # (M, M) = N_v S N_i
    w: jnp.ndarray        # (n,) DC source vector
    w_scale: jnp.ndarray  # scalar: 2.0 for trapezoidal, 1.0 for BE
    v_dc: jnp.ndarray     # (n,) DC operating point
    i_dc: jnp.ndarray     # (M,) device currents at DC OP
    v_nl_dc: jnp.ndarray  # (M,) port voltages at DC OP
    trap_i_hist: jnp.ndarray  # scalar: 1.0 (trap: rhs += N_i i_prev) or 0.0
    # Backward-Euler fallback variant (== primary when integrator="be"):
    # the dissipative integrator the solver replays failed samples with
    # and holds for FALLBACK_COOLDOWN samples (gen_preamp.rs:3482-3568).
    s_be: jnp.ndarray
    a_hist_be: jnp.ndarray
    s_ni_be: jnp.ndarray
    k_be: jnp.ndarray
    w_scale_be: jnp.ndarray


class SolverDiag(NamedTuple):
    """Per-stream robustness diagnostics (gen_preamp.rs diag_* counters)."""

    cooldown: jnp.ndarray   # (...,) i32 — BE-fallback samples remaining
    nr_fail: jnp.ndarray    # (...,) i32 — NR non-convergence / ringing
    nan_reset: jnp.ndarray  # (...,) i32 — NaN → DC-OP resets
    damp: jnp.ndarray       # (...,) i32 — voltage-damping net hits
    be_steps: jnp.ndarray   # (...,) i32 — samples integrated with BE


def init_diag(batch_shape=()) -> SolverDiag:
    z = jnp.zeros(batch_shape, dtype=jnp.int32)
    return SolverDiag(z, z, z, z, z)


class SolverState(NamedTuple):
    v: jnp.ndarray        # (..., n) previous solution
    i_nl: jnp.ndarray     # (..., M) previous device currents
    v_nl: jnp.ndarray     # (..., M) previous port voltages (NR warm start)
    nr_resid: jnp.ndarray  # (...,) f64 — last solve's final NR residual [V]
    diag: SolverDiag


FALLBACK_COOLDOWN = 64   # samples of BE after a failure (gen_preamp.rs)
RINGING_VOLTS = 55.0     # node-swing threshold triggering fallback
DAMP_VOLTS = 30.0        # per-sample node-delta voltage-damping net
FAIL_RESID = 1e-3        # NR residual counted as a failure [V]


def dc_solve(netlist: Netlist, n_iter=300, clamp=0.1, source_steps=8):
    """Nonlinear DC operating point via source-stepped, jitted NR.

    Supplies ramp from a fraction to full value over `source_steps` stages,
    warm-starting each stage — robustly biases circuits with large
    reverse-biased junctions (e.g. the ±22 V Class AB output stage) that a
    single cold NR with small step clamps cannot reach.
    """
    asm = netlist.assemble()
    g, w, n_v, n_i = asm["g"], asm["w"], asm["n_v"], asm["n_i"]
    n, m = asm["n"], asm["m"]
    dev_fn = netlist.device_current_fn()
    dev_jac = jax.jacfwd(dev_fn)

    # Regularise pure-capacitor nodes (no DC path): tiny gmin to ground.
    g_reg = g + np.eye(n) * 1e-12
    s_dc = np.linalg.inv(g_reg)
    k_dc = jnp.asarray(n_v @ s_dc @ n_i)
    p_full = jnp.asarray(n_v @ (s_dc @ w))
    eye_m = jnp.eye(m)

    @jax.jit
    def nr_stage(v_nl0, scale):
        p = p_full * scale

        def body(_, v_nl):
            i_nl = dev_fn(v_nl)
            f = v_nl - p - k_dc @ i_nl
            jac = eye_m - k_dc @ dev_jac(v_nl)
            dv = solve_f32(jac, f)
            # Direction-preserving trust region: scale the whole NR step so
            # no port moves more than `clamp` volts — keeps the coupled
            # system on the Newton direction while preventing exp blow-ups.
            scale_tr = jnp.minimum(1.0, clamp / jnp.maximum(
                jnp.max(jnp.abs(dv)), 1e-30))
            return v_nl - dv * scale_tr

        v_nl = jax.lax.fori_loop(0, n_iter, body, v_nl0)
        resid = jnp.max(jnp.abs(v_nl - p - k_dc @ dev_fn(v_nl)))
        return v_nl, resid

    v_nl = jnp.zeros(m, dtype=jnp.float64)
    for k in range(source_steps):
        scale = (k + 1) / source_steps
        v_nl, resid = nr_stage(v_nl, scale)
    if float(resid) > 1e-9:
        raise RuntimeError(f"DC solve did not converge: residual {resid}")

    i_nl = np.asarray(dev_fn(v_nl))
    v_nl = np.asarray(v_nl)
    v_dc = s_dc @ (w + n_i @ i_nl)
    return v_dc, i_nl, v_nl


def make_solver_params(netlist: Netlist, sample_rate, integrator="trap",
                       v_dc=None, i_dc=None, v_nl_dc=None) -> SolverParams:
    """Assemble fixed matrices for a given rate + integrator."""
    asm = netlist.assemble()
    g, c_mat, w = asm["g"], asm["c"], asm["w"]
    n_v, n_i = asm["n_v"], asm["n_i"]
    t = 1.0 / float(sample_rate)

    n_nodes = netlist.n_nodes
    if integrator == "trap":
        a = g + (2.0 / t) * c_mat
        a_hist = (2.0 / t) * c_mat - g
        # Algebraic rows (voltage-source constraints, rows >= n_nodes) have
        # no C entries; giving them trapezoidal history would create a
        # marginally-stable alternating mode (v[n] = 2V - v[n-1]). Enforce
        # them instantaneously instead: no history, w scale 1.
        a_hist[n_nodes:, :] = 0.0
        w_scale = np.full(a.shape[0], 2.0)
        w_scale[n_nodes:] = 1.0
        trap_i = 1.0
    elif integrator == "be":
        a = g + (1.0 / t) * c_mat
        a_hist = (1.0 / t) * c_mat
        w_scale = np.ones(a.shape[0])
        trap_i = 0.0
    else:
        raise ValueError(integrator)

    s = np.linalg.inv(a)
    if v_dc is None:
        v_dc, i_dc, v_nl_dc = dc_solve(netlist)

    # BE fallback variant (identical to primary when integrator="be").
    a_be = g + (1.0 / t) * c_mat
    s_be = np.linalg.inv(a_be)
    a_hist_be = (1.0 / t) * c_mat
    w_scale_be = np.ones(a.shape[0])

    f64 = lambda x: jnp.asarray(x, dtype=jnp.float64)
    return SolverParams(
        s=f64(s), a_hist=f64(a_hist), n_v=f64(n_v), n_i=f64(n_i),
        s_ni=f64(s @ n_i), k=f64(n_v @ s @ n_i), w=f64(w),
        w_scale=f64(w_scale), v_dc=f64(v_dc), i_dc=f64(i_dc),
        v_nl_dc=f64(v_nl_dc), trap_i_hist=f64(trap_i),
        s_be=f64(s_be), a_hist_be=f64(a_hist_be),
        s_ni_be=f64(s_be @ n_i), k_be=f64(n_v @ s_be @ n_i),
        w_scale_be=f64(w_scale_be),
    )


def init_state(params: SolverParams, batch_shape=()) -> SolverState:
    return SolverState(
        v=jnp.broadcast_to(params.v_dc, batch_shape + params.v_dc.shape),
        i_nl=jnp.broadcast_to(params.i_dc, batch_shape + params.i_dc.shape),
        v_nl=jnp.broadcast_to(params.v_nl_dc,
                              batch_shape + params.v_nl_dc.shape),
        nr_resid=jnp.zeros(batch_shape, dtype=jnp.float64),
        diag=init_diag(batch_shape),
    )


def junction_limits(netlist: Netlist):
    """Per-port (nvt, vcrit) for SPICE-style junction voltage limiting.

    vcrit = nvt·ln(nvt / (√2·IS)) — the voltage where the junction's
    exponential current slope equals 1/nvt of itself; Newton steps that
    jump past it get log-compressed (pnjlim). Returns NumPy (M,) arrays.
    """
    nvt, vcrit = [], []
    for _, _, _, _, model, _sign in netlist.bjts:
        for n_em in (model.nf, model.nr):
            v = n_em * model.vt
            nvt.append(v)
            vcrit.append(v * np.log(v / (np.sqrt(2.0) * model.is_)))
    for _, _, _, model in netlist.diodes:
        v = model.n * model.vt
        nvt.append(v)
        vcrit.append(v * np.log(v / (np.sqrt(2.0) * model.is_)))
    return np.asarray(nvt), np.asarray(vcrit)


def pnjlim(v_old, v_new, nvt, vcrit):
    """SPICE junction limiting: log-compress forward-biased overshoots.

    An NR step that jumps a junction past vcrit by more than 2·nvt lands
    on an exponential wall the next iteration must walk back ~nvt at a
    time (the reference budgets ≤70 iterations largely for this,
    gen_power_amp.rs:29-49). Compressing the step to
    v_old + nvt·ln(1 + δ/nvt) keeps Newton in the quadratic basin —
    junction turn-on converges in ~3-6 iterations.
    """
    delta = v_new - v_old
    lim = v_old + nvt * jnp.log1p(jnp.maximum(delta, 0.0) / nvt)
    apply = (v_new > vcrit) & (delta > 2.0 * nvt)
    return jnp.where(apply, lim, v_new)


def make_step(netlist: Netlist, params: SolverParams, max_iter=50,
              nr_tol=1e-9, nr_iters=None):
    """Build the per-sample step fn for this netlist.

    Returns step(state, w_extra, x) → (state, v_full):
      w_extra: (..., n) additive source adjustments for this sample
               (runtime rail offsets on vsrc rows, input on the input row) —
               pass jnp.zeros(n) when unused.
    The caller extracts output node voltages from v_full.
    """
    from openwurli_tpu.circuits import gp

    dev_fn = netlist.device_current_fn()
    # Closed-form GP/diode derivatives: one evaluation per NR iteration
    # (the 2-JVP block recovery re-traced the current function twice per
    # iteration and dominated the power-amp stage cost).
    dev_jac = gp.analytic_device_jacobian_fn(netlist)
    m = int(params.k.shape[0])
    nvt_pl, vcrit_pl = junction_limits(netlist)

    # Fixed NR iteration count: a while_loop would add per-iteration sync
    # overhead and prevents batching; with per-sample warm starts 2-4
    # iterations typically converge, and the masked updates make the rest
    # free of side effects. Residual-based failure detection replaces the
    # iteration-count criterion.
    nr_iters_fixed = nr_iters if nr_iters is not None else min(max_iter, 16)

    def nr_solve(p, v_nl0, k_eff):
        """Solve v_nl = p + K i(v_nl): fixed-count masked NR, inline GE."""

        def body(_, carry):
            v_nl, done = carry
            i_nl = dev_fn(v_nl)
            f = v_nl - p - jnp.einsum("...ij,...j->...i", k_eff, i_nl)
            jdev = dev_jac(v_nl)
            jac = jnp.eye(m) - jnp.einsum("...ij,...jk->...ik", k_eff,
                                          jdev)
            dv = ge_solve_f32(jac, f)
            # Step limiting: ≤ 2 V linear travel per iteration, then
            # SPICE pnjlim compression for forward-junction overshoots
            # (replaces the old blanket 0.5 V clamp, which both starved
            # the output ports' legitimate rail-to-rail travel AND let
            # junctions overshoot far enough to stall 16-iteration NR at
            # every crossover).
            dv = jnp.clip(dv, -2.0, 2.0)
            v_cand = pnjlim(v_nl, v_nl - dv, jnp.asarray(nvt_pl),
                            jnp.asarray(vcrit_pl))
            conv = jnp.max(jnp.abs(f), axis=-1) < nr_tol
            v_nl = jnp.where(conv[..., None] | done[..., None],
                             v_nl, v_cand)
            return v_nl, done | conv

        done0 = jnp.zeros(p.shape[:-1], dtype=bool)
        v_nl, done = jax.lax.fori_loop(0, nr_iters_fixed, body,
                                       (v_nl0, done0))
        # Final residual for divergence detection (replaces iter counts).
        f = v_nl - p - jnp.einsum("...ij,...j->...i", k_eff,
                                  dev_fn(v_nl))
        resid = jnp.max(jnp.abs(f), axis=-1)
        return v_nl, resid

    n_nodes_net = netlist.n_nodes

    def solve_once(state, w_extra, be: bool):
        """One integration step with the trap or BE matrices (static
        choice → unbatched constants; the per-stream merge happens in the
        rarely-taken lax.cond branch of step())."""
        if be:
            a_hist, s_mat = params.a_hist_be, params.s_be
            s_ni, k_eff = params.s_ni_be, params.k_be
            w_sc, trap_i = params.w_scale_be, 0.0
        else:
            a_hist, s_mat = params.a_hist, params.s
            s_ni, k_eff = params.s_ni, params.k
            w_sc, trap_i = params.w_scale, params.trap_i_hist

        rhs = jnp.einsum("ij,...j->...i", a_hist, state.v)
        rhs = rhs + w_sc * params.w + w_extra
        rhs = rhs + trap_i * jnp.einsum(
            "im,...m->...i", params.n_i, state.i_nl)
        v_lin = jnp.einsum("ij,...j->...i", s_mat, rhs)
        p = jnp.einsum("mi,...i->...m", params.n_v, v_lin)
        v_nl, resid = nr_solve(p, state.v_nl, k_eff)
        i_new = dev_fn(v_nl)
        v = v_lin + jnp.einsum("im,...m->...i", s_ni, i_new)
        return v, i_new, v_nl, resid

    is_trap_primary = float(np.asarray(params.trap_i_hist)) != 0.0

    def step(state: SolverState, w_extra, _unused_x=None):
        """Robustness ladder (gen_preamp.rs:3482-3641): trapezoidal
        primary → failure detection (NR residual / node ringing /
        non-finite) → masked backward-Euler replay of the failed sample
        with a FALLBACK_COOLDOWN-sample BE hold → adaptive voltage
        damping → NaN reset to the DC OP, all counted in SolverDiag.
        The BE branch runs inside a lax.cond so normal content pays
        nothing for it."""
        dg = state.diag
        use_be = dg.cooldown > 0
        v, i_new, v_nl, resid = solve_once(state, w_extra, be=False)

        def failed(v_, resid_):
            node_v = v_[..., :n_nodes_net]
            ring = jnp.max(jnp.abs(node_v), axis=-1) > RINGING_VOLTS
            nonfin = ~jnp.all(jnp.isfinite(v_), axis=-1)
            return (resid_ > FAIL_RESID) | ring | nonfin

        fail1 = failed(v, resid)
        # Streams that failed this sample OR are inside a BE cooldown get
        # the backward-Euler result instead.
        need_be = (fail1 | use_be) if is_trap_primary else jnp.zeros_like(
            fail1)

        def do_be(args):
            v_, i_, vnl_, res_ = args
            vb, ib, vnlb, resb = solve_once(state, w_extra, be=True)
            sel = need_be[..., None]
            return (jnp.where(sel, vb, v_), jnp.where(sel, ib, i_),
                    jnp.where(sel, vnlb, vnl_),
                    jnp.where(need_be, resb, res_))

        if is_trap_primary:
            v, i_new, v_nl, resid = jax.lax.cond(
                jnp.any(need_be), do_be, lambda a: a,
                (v, i_new, v_nl, resid))
        fail = failed(v, resid)

        # Adaptive voltage damping: cap the per-sample node swing.
        dv = v - state.v
        dv_max = jnp.max(jnp.abs(dv), axis=-1)
        damp_hit = jnp.isfinite(dv_max) & (dv_max > DAMP_VOLTS)
        scale = jnp.where(damp_hit, DAMP_VOLTS / jnp.maximum(dv_max, 1e-30),
                          1.0)
        v = state.v + dv * scale[..., None]

        # NaN guard: masked reset to DC OP.
        bad = ~jnp.all(jnp.isfinite(v), axis=-1)
        v = jnp.where(bad[..., None], params.v_dc, v)
        i_new = jnp.where(bad[..., None], params.i_dc, i_new)
        v_nl = jnp.where(bad[..., None], params.v_nl_dc, v_nl)

        cooldown = jnp.where(fail, jnp.int32(FALLBACK_COOLDOWN),
                             jnp.maximum(dg.cooldown - 1, 0))
        diag = SolverDiag(
            cooldown=cooldown,
            nr_fail=dg.nr_fail + fail.astype(jnp.int32),
            nan_reset=dg.nan_reset + bad.astype(jnp.int32),
            damp=dg.damp + damp_hit.astype(jnp.int32),
            be_steps=dg.be_steps + need_be.astype(jnp.int32),
        )
        return SolverState(
            v=v, i_nl=i_new, v_nl=v_nl,
            nr_resid=jnp.broadcast_to(resid, bad.shape), diag=diag,
        ), v

    return step
