"""On-device MLP training for per-note corrections (JAX, replaces PyTorch).

Architecture: Input(2) → Dense(H, ReLU) → Dense(H, ReLU) → Dense(11).
Masked, tier-weighted Huber loss (δ=5) on per-target-standardised residual
targets — matching the reference's ml/train_mlp.py training recipe but as a
pure-jnp train step that jits/shards (BASELINE config 5: the whole
render → Goertzel → residual → train loop runs on device; the data-batch
axis shards over a mesh and the gradient mean becomes an ICI psum).

Trained weights export straight into mlp.MlpWeights — no codegen step; the
engine consumes the arrays directly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from openwurli_tpu import mlp

N_OUTPUTS = 11
N_FREQ = 5
N_DECAY = 5
DS_IDX = 10
HUBER_DELTA = 5.0


class TrainBatch(NamedTuple):
    inputs: jnp.ndarray   # (N, 2) normalised (midi_norm, vel_norm)
    targets: jnp.ndarray  # (N, 11) raw residual targets
    mask: jnp.ndarray     # (N, 11) bool — valid entries
    weights: jnp.ndarray  # (N,) isolation-tier weights


def init_weights(key, hidden=16, target_means=None, target_stds=None,
                 dtype=jnp.float64) -> mlp.MlpWeights:
    k1, k2, k3 = jax.random.split(key, 3)

    def glorot(k, shape):
        fan = shape[0] + shape[1]
        return jax.random.normal(k, shape, dtype) * jnp.sqrt(2.0 / fan)

    if target_means is None:
        target_means = jnp.zeros(N_OUTPUTS, dtype)
    if target_stds is None:
        target_stds = jnp.ones(N_OUTPUTS, dtype)
    return mlp.MlpWeights(
        w1=glorot(k1, (hidden, 2)), b1=jnp.zeros(hidden, dtype),
        w2=glorot(k2, (hidden, hidden)), b2=jnp.zeros(hidden, dtype),
        w3=glorot(k3, (N_OUTPUTS, hidden)), b3=jnp.zeros(N_OUTPUTS, dtype),
        target_means=jnp.asarray(target_means, dtype),
        target_stds=jnp.asarray(target_stds, dtype),
    )


def standardise_targets(targets, mask):
    """Per-target mean/std over valid entries (train_mlp.py:104-113).

    Decay targets clipped to ±20, ds to [0.5, 2.0] before standardising.
    Returns (targets_clipped, means, stds)."""
    targets = targets.at[..., N_FREQ:N_FREQ + N_DECAY].set(
        jnp.clip(targets[..., N_FREQ:N_FREQ + N_DECAY], -20.0, 20.0))
    targets = targets.at[..., DS_IDX].set(
        jnp.clip(targets[..., DS_IDX], 0.5, 2.0))
    m = mask.astype(jnp.float64)
    n_valid = jnp.maximum(m.sum(axis=0), 1.0)
    means = (targets * m).sum(axis=0) / n_valid
    var = ((targets - means) ** 2 * m).sum(axis=0) / n_valid
    stds = jnp.maximum(jnp.sqrt(var), 1e-6)
    return targets, means, stds


def _forward_norm(weights: mlp.MlpWeights, inputs):
    """Forward pass in standardised-target space."""
    h1 = jnp.maximum(inputs @ weights.w1.T + weights.b1, 0.0)
    h2 = jnp.maximum(h1 @ weights.w2.T + weights.b2, 0.0)
    return h2 @ weights.w3.T + weights.b3


def masked_huber_loss(weights: mlp.MlpWeights, batch: TrainBatch):
    pred = _forward_norm(weights, batch.inputs)
    target_norm = (batch.targets - weights.target_means) / weights.target_stds
    diff = pred - target_norm
    abs_diff = jnp.abs(diff)
    huber = jnp.where(abs_diff < HUBER_DELTA, 0.5 * diff**2,
                      HUBER_DELTA * (abs_diff - 0.5 * HUBER_DELTA))
    m = batch.mask.astype(pred.dtype)
    loss = huber * m * batch.weights[..., None]
    return loss.sum() / jnp.maximum(m.sum(), 1.0)


def make_train_step(learning_rate=1e-3):
    """Plain-Adam train step over the MlpWeights pytree.

    Only the network weights train; target_means/stds stay frozen. Under a
    sharded batch, the loss mean makes the gradients an XLA all-reduce.
    """
    import optax

    trainable = ("w1", "b1", "w2", "b2", "w3", "b3")
    opt = optax.adam(learning_rate)

    def mask_grads(tree):
        return mlp.MlpWeights(
            **{k: (getattr(tree, k) if k in trainable
                   else jnp.zeros_like(getattr(tree, k)))
               for k in mlp.MlpWeights._fields})

    def init(weights):
        return opt.init(weights)

    @jax.jit
    def step(weights, opt_state, batch):
        loss, grads = jax.value_and_grad(masked_huber_loss)(weights, batch)
        grads = mask_grads(grads)
        updates, opt_state = opt.update(grads, opt_state, weights)
        weights = optax.apply_updates(weights, updates)
        return weights, opt_state, loss

    return init, step


def train(batch: TrainBatch, hidden=16, epochs=2000, learning_rate=1e-3,
          seed=0, log_every=0):
    """Full-batch training loop. Returns trained MlpWeights."""
    targets, means, stds = standardise_targets(batch.targets, batch.mask)
    batch = batch._replace(targets=targets)
    weights = init_weights(jax.random.PRNGKey(seed), hidden,
                           target_means=means, target_stds=stds)
    init, step = make_train_step(learning_rate)
    opt_state = init(weights)
    for epoch in range(epochs):
        weights, opt_state, loss = step(weights, opt_state, batch)
        if log_every and epoch % log_every == 0:
            print(f"epoch {epoch}: loss {float(loss):.5f}")
    return weights


def save_weights(weights: mlp.MlpWeights, path):
    import numpy as np

    np.savez(path, **{k: np.asarray(getattr(weights, k))
                      for k in mlp.MlpWeights._fields})
