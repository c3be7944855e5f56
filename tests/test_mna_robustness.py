"""Solver robustness ladder: BE fallback + cooldown, voltage damping,
NaN reset, and diag counters (gen_preamp.rs:3482-3641, 1616-1633)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openwurli_tpu.circuits import mna, power_amp as pamod, tremolo as trmod

pytestmark = pytest.mark.slow  # multi-minute end-to-end renders on 1-core CPU

OS_SR = 88200.0


def _scan_pa(xs, state=None):
    pa = pamod.make_params(OS_SR)

    def body(st, x):
        st, y = pamod.step(pa, st, x, rail_sag=True)
        return st, y

    st0 = state if state is not None else pamod.init_state(pa)
    return jax.lax.scan(body, st0, jnp.asarray(xs))


def test_counters_zero_on_normal_content():
    """gen_preamp.rs:3596-3600 expectation: guards never fire on music."""
    t = np.arange(3000) / OS_SR
    env = np.minimum(np.arange(3000) / 300.0, 1.0)
    u = env * 0.2 * np.sin(2 * np.pi * 880 * t)
    st, y = _scan_pa(u)
    d = st.circuit.diag
    assert int(jnp.sum(d.nr_fail)) == 0
    assert int(jnp.sum(d.nan_reset)) == 0
    assert int(jnp.sum(d.be_steps)) == 0
    assert np.isfinite(np.asarray(y)).all()


def test_fault_injection_fallback_and_recovery():
    """A two-sample 500 V spike must trip the ladder (counters move,
    BE cooldown engages on the tremolo's trapezoidal solver) and the
    solver must recover to finite, small output afterwards."""
    tp = trmod.make_params(OS_SR)
    step = mna.make_step(trmod.build_netlist(), tp.solver, nr_iters=4)
    n = tp.solver.w.shape[0]

    st = mna.init_state(tp.solver)
    w0 = jnp.zeros(n, dtype=jnp.float64)
    spike = w0.at[tp.out_idx].set(500.0)

    def run(st, w_extra, count):
        def body(s, _):
            s, v = step(s, w_extra)
            return s, v

        return jax.lax.scan(body, st, None, length=count)

    st, _ = run(st, w0, 32)
    st, _ = run(st, spike, 2)     # inject
    st, v = run(st, w0, 400)      # recover
    d = st.diag
    fired = (int(d.nr_fail) + int(d.damp) + int(d.nan_reset)
             + int(d.be_steps))
    assert fired > 0, "fault injection did not trip any guard"
    v = np.asarray(v)
    assert np.isfinite(v).all()
    # Settled back near the operating point (node voltages bounded).
    assert np.abs(v[-50:]).max() < 40.0
    assert int(d.cooldown) == 0 or int(d.cooldown) < mna.FALLBACK_COOLDOWN


def test_engine_diag_surface():
    from openwurli_tpu import engine

    eng = engine.Engine(44100.0)
    eng.note_on(60, 0.7)
    eng.render(1024)
    pd = eng.power_amp_diag()
    assert set(pd) == {"cooldown", "nr_fail", "nan_reset", "damp",
                      "be_steps"}
    assert pd["nr_fail"] == 0 and pd["nan_reset"] == 0
    td = eng.tremolo_diag()
    assert td["nan_reset"] == 0
