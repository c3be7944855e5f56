"""Multi-chip dry run — executed as `python -m openwurli_tpu.parallel.dryrun N`.

Validates the framework's multi-chip story (SURVEY §2.6: data parallelism
over the independent note×velocity grid) on an N-device virtual CPU mesh:

  1. Forces the CPU platform with N virtual devices BEFORE any jax op —
     this process must never touch the session's pinned accelerator
     (round-1 failure: an eager op initialised the tunneled TPU backend
     and died on a libtpu version mismatch).
  2. Builds an N-device jax.sharding.Mesh, shards the note grid, and jits
     ONE full training step over it: batched voice render → Goertzel
     harmonic extraction → residual targets → masked-Huber MLP update.
     The loss mean over the sharded batch axis makes the gradients an
     XLA all-reduce over the mesh.
  3. Correctness gate: re-runs the identical step with every input on a
     single device and asserts the sharded result equals the unsharded
     one to ≤1e-12 — the actual multi-chip correctness question.

Run via __graft_entry__.dryrun_multichip (subprocess with a scrubbed env).
"""

import os
import sys


def _force_cpu_platform(n_devices: int) -> None:
    """Must run before `import jax` (tests/conftest.py recipe)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    os.environ["XLA_FLAGS"] = " ".join(flags)


def main(n_devices: int) -> None:
    _force_cpu_platform(n_devices)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from openwurli_tpu import voice
    from openwurli_tpu.calib import goertzel, train
    from openwurli_tpu.parallel import mesh as meshlib

    devices = jax.devices("cpu")[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} virtual CPU devices, have {len(devices)} "
        f"(XLA_FLAGS={os.environ.get('XLA_FLAGS')})")
    mesh = meshlib.make_mesh(devices)
    data = NamedSharding(mesh, P(meshlib.DATA_AXIS))
    repl = NamedSharding(mesh, P())

    sr = 8000.0
    per_dev = 2
    g_host = jnp.linspace(48.0, 84.0, n_devices * per_dev)
    v_host = jnp.full_like(g_host, 0.8)
    weights_host = train.init_weights(jax.random.PRNGKey(0))
    n_samples = 400

    def train_step(weights, g, v):
        """Full step: sharded render → analysis → loss → weight update."""
        vparams, detuned = voice.note_on_params(g, v, sr, mlp_enabled=False)
        vstate = voice.init_state(vparams, detuned, v, sr,
                                  voice.default_note_seed(g))
        _, audio = voice.render(vparams, vstate, n_samples)  # (n, G)

        f0, mags = goertzel.harmonic_ladder(audio.T, detuned, sr,
                                            n_harmonics=6, refine=False)
        rel_db = 20.0 * jnp.log10(
            jnp.maximum(mags[:, 1:6], 1e-12)
            / jnp.maximum(mags[:, :1], 1e-12))
        targets = jnp.concatenate(
            [rel_db * 0.1,
             jnp.ones_like(rel_db),
             jnp.ones((g.shape[0], 1))], axis=-1)  # (G, 11)
        inputs = jnp.stack([(g - 21.0) / 87.0, v], axis=-1)
        batch = train.TrainBatch(
            inputs=inputs, targets=targets,
            mask=jnp.ones_like(targets, dtype=bool),
            weights=jnp.ones(g.shape[0]))
        loss, grads = jax.value_and_grad(train.masked_huber_loss)(
            weights, batch)
        new_weights = jax.tree.map(lambda w_, g_: w_ - 1e-3 * g_,
                                   weights, grads)
        return new_weights, loss

    # ── sharded step over the N-device mesh ──────────────────────────────
    g_sh = jax.device_put(g_host, data)
    v_sh = jax.device_put(v_host, data)
    w_sh = jax.device_put(weights_host, repl)
    sharded_step = jax.jit(
        train_step,
        in_shardings=(repl, data, data),
        out_shardings=(repl, repl))
    new_w_sh, loss_sh = jax.block_until_ready(sharded_step(w_sh, g_sh, v_sh))
    assert jnp.isfinite(loss_sh), f"non-finite sharded loss {loss_sh}"
    n_shards = len(new_w_sh.w3.sharding.device_set)
    delta = float(jnp.abs(new_w_sh.w3 - weights_host.w3).max())
    assert delta > 0.0, "sharded training step produced no update"

    # ── reference: identical step, everything on one device ─────────────
    one = devices[0]
    new_w_1, loss_1 = jax.block_until_ready(jax.jit(train_step)(
        jax.device_put(weights_host, one),
        jax.device_put(g_host, one),
        jax.device_put(v_host, one)))

    # Sharded-vs-single-device numerical equality (f64 on CPU; the only
    # reduction is the loss mean, whose sharded partial-sum order may
    # differ — ≤1e-12 absolute is far below any legitimate difference).
    # Compare on host: the operands live on different device sets.
    import numpy as np

    err_loss = float(np.abs(np.asarray(loss_sh) - np.asarray(loss_1)))
    err_w = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(new_w_sh), jax.tree.leaves(new_w_1)))
    assert err_loss <= 1e-12, f"sharded loss deviates: {err_loss:.3e}"
    assert err_w <= 1e-12, f"sharded weights deviate: {err_w:.3e}"

    print(f"dryrun_multichip({n_devices}): platform="
          f"{devices[0].platform} mesh={tuple(mesh.shape.values())} "
          f"loss={float(loss_sh):.6f} dW3={delta:.3e} "
          f"sharded-vs-single |dloss|={err_loss:.1e} |dW|max={err_w:.1e} "
          f"replicated-on={n_shards} devices — OK")

    # ── phase 2: the PRODUCTION kernels under shard_map ──────────────────
    # The training-step gate above rides the f64 scan path; this runs the
    # fused Pallas voice-bank + mono-chain kernels (interpret mode on the
    # virtual mesh) sharded over streams and gates sharded == unsharded.
    from openwurli_tpu import fast
    from openwurli_tpu.kernels import mono_chain as mc

    # Production geometry, scaled to the driver budget: one full
    # T_TILE=512 chain tile and 16 voices/stream → 128 lanes per device
    # (the full kernel lane width). tests/test_fast_sharded.py extends
    # this to 12 tiles / 0.77 s in the slow tier.
    rng = np.random.default_rng(0)
    midis = rng.uniform(40.0, 88.0, size=(n_devices, 16))
    t_kernel = mc.T_TILE
    out_sh = np.asarray(fast.render_grid_sharded(
        mesh, midis, 0.8, t_kernel / 44100.0, interpret=True,
        t_tile=mc.T_TILE))
    assert out_sh.shape == (t_kernel, n_devices)
    assert np.isfinite(out_sh).all()
    assert len(np.unique(out_sh[-1, :])) == n_devices, \
        "streams collapsed across shards"
    # BIT-level gate: each device's shard_map body traces the SAME
    # program an unsharded render of that shard alone traces (identical
    # local shapes), so shard_map must reproduce the standalone renders
    # EXACTLY — any deviation at all is a sharding bug (lane permutation,
    # wrong ctrl/state row, stitch offset). Value-tolerance gates against
    # the S=8 batch render can't do this job: XLA's shape-dependent FMA
    # contraction seeds ulp deltas that the chain's NR trajectory
    # amplifies ~1e3× within 128 samples at this drive (measured; see
    # tests/test_mono_chain.py full-chain gate notes).
    oracle = np.concatenate(
        [np.asarray(fast.render_grid(midis[i:i + 1], 0.8,
                                     t_kernel / 44100.0, interpret=True,
                                     t_tile=mc.T_TILE))
         for i in range(n_devices)], axis=1)
    np.testing.assert_array_equal(out_sh, oracle,
                                  err_msg="sharded render is not "
                                          "bit-identical to per-shard "
                                          "standalone renders")
    print(f"dryrun_multichip({n_devices}) phase 2: fused kernels sharded "
          f"over {n_devices} devices, bit-identical to per-shard "
          "standalone renders — OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
