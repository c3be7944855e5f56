"""Learned onset + pitch detector for note extraction (ML stage 1).

The reference pipeline's first stage uses the pretrained basic-pitch
network for onset/pitch posteriorgrams (reference ml/extract_notes.py:1-10);
that model isn't in this image, so this module trains a SMALL JAX network
from scratch on audio rendered by this repo's own synthesis path — the
model learns the instrument it will transcribe, which is exactly the
calibration use-case (chopping real Wurlitzer recordings into notes).

Design (TPU-friendly, all-JAX):
  * features: log triangular filterbank (96 log-spaced bands, 40 Hz-4.2 kHz)
    over |rfft| frames (~93 ms, hop /8 — the long window resolves
    low-register semitones), standardized per-bin by trained stats;
  * model: per-frame MLP over a 7-frame context window
    (672 → 384 → 160 → [onset logit, 62 pitch logits: MIDI 36-96 + none]);
  * training: mixtures synthesized from fast-path single-note renders
    (random onsets/gains/polyphony + noise), masked BCE (onset) +
    CE (pitch) with optax.adam — see tools/train_onset_model.py;
  * decoding: onset peak-picking on the posterior + pitch argmax over the
    0.4 s after each onset → the same note-dict schema as
    calib.notes.extract_notes.

Weights live in openwurli_tpu/data/onset_pitch.npz (regenerable).
"""

from __future__ import annotations

import os

import numpy as np

N_BINS = 96
F_LO = 40.0
F_HI = 4200.0
CONTEXT = 7               # frames of context (centered)
MIDI_LO, MIDI_HI = 36, 96
N_PITCH = MIDI_HI - MIDI_LO + 1 + 1   # + "no pitch" class
HIDDEN1, HIDDEN2 = 384, 160

_DATA = os.path.join(os.path.dirname(__file__), "..", "data",
                     "onset_pitch.npz")


def frame_params(sr):
    """(frame_len, hop) ≈ 93 ms / 11.6 ms at any sample rate.

    The long window buys low-register resolution: at 44.1 kHz a 46 ms
    window's 21.5 Hz bins cannot separate semitones below ~E2, where the
    keyboard starts (MIDI 36 ≈ 65 Hz)."""
    frame = 1 << max(9, int(round(np.log2(0.093 * sr))))
    return frame, frame // 8


def _filterbank(sr, frame):
    """(N_BINS, frame//2+1) triangular log-spaced filterbank."""
    freqs = np.fft.rfftfreq(frame, 1.0 / sr)
    f_hi = min(F_HI, 0.45 * sr)
    edges = np.exp(np.linspace(np.log(F_LO), np.log(f_hi), N_BINS + 2))
    fb = np.zeros((N_BINS, len(freqs)))
    for b in range(N_BINS):
        lo, mid, hi = edges[b], edges[b + 1], edges[b + 2]
        up = (freqs - lo) / max(mid - lo, 1e-9)
        down = (hi - freqs) / max(hi - mid, 1e-9)
        fb[b] = np.clip(np.minimum(up, down), 0.0, None)
        s = fb[b].sum()
        if s > 0:
            fb[b] /= s
    return fb


def features(audio, sr):
    """Log-filterbank frames → (n_frames, N_BINS) float32."""
    x = np.asarray(audio, dtype=np.float64)
    if x.ndim > 1:
        x = x.mean(axis=1)
    frame, hop = frame_params(sr)
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    n = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
    spec = np.abs(np.fft.rfft(x[idx] * np.hanning(frame), axis=1))
    fb = _filterbank(sr, frame)
    return np.log(spec @ fb.T + 1e-6).astype(np.float32)


def context_windows(feats):
    """(n, N_BINS) → (n, CONTEXT*N_BINS) centered context (edge-padded)."""
    half = CONTEXT // 2
    padded = np.pad(feats, ((half, half), (0, 0)), mode="edge")
    cols = [padded[i:i + len(feats)] for i in range(CONTEXT)]
    return np.concatenate(cols, axis=1)


def init_params(seed=0):
    rng = np.random.default_rng(seed)

    def glorot(shape):
        lim = np.sqrt(6.0 / (shape[0] + shape[1]))
        return rng.uniform(-lim, lim, shape).astype(np.float32)

    d_in = CONTEXT * N_BINS
    return {
        "W1": glorot((d_in, HIDDEN1)), "b1": np.zeros(HIDDEN1, np.float32),
        "W2": glorot((HIDDEN1, HIDDEN2)),
        "b2": np.zeros(HIDDEN2, np.float32),
        "Wo": glorot((HIDDEN2, 1)), "bo": np.zeros(1, np.float32),
        "Wp": glorot((HIDDEN2, N_PITCH)),
        "bp": np.zeros(N_PITCH, np.float32),
        "feat_mean": np.zeros(N_BINS, np.float32),
        "feat_std": np.ones(N_BINS, np.float32),
    }


def forward(params, x):
    """x (n, CONTEXT*N_BINS) → (onset_logits (n,), pitch_logits (n, P))."""
    import jax.numpy as jnp

    mean = jnp.tile(params["feat_mean"], CONTEXT)
    std = jnp.tile(params["feat_std"], CONTEXT)
    h = (x - mean) / std
    h = jnp.maximum(h @ params["W1"] + params["b1"], 0.0)
    h = jnp.maximum(h @ params["W2"] + params["b2"], 0.0)
    onset = (h @ params["Wo"] + params["bo"])[:, 0]
    pitch = h @ params["Wp"] + params["bp"]
    return onset, pitch


def loss_fn(params, x, y_onset, y_pitch, onset_pos_weight=8.0):
    """Masked BCE (onset) + CE (pitch; y_pitch −1 = unsupervised)."""
    import jax.numpy as jnp

    ol, pl = forward(params, x)
    # BCE with positive-class weighting (onsets are ~2 % of frames)
    z = jnp.clip(ol, -30.0, 30.0)
    bce = jnp.maximum(z, 0.0) - z * y_onset + jnp.log1p(jnp.exp(-jnp.abs(z)))
    w = 1.0 + (onset_pos_weight - 1.0) * y_onset
    onset_loss = jnp.mean(w * bce)
    mask = (y_pitch >= 0).astype(jnp.float32)
    # cross-entropy with a stable log-sum-exp
    mx = pl.max(axis=1, keepdims=True)
    logz = jnp.log(jnp.sum(jnp.exp(pl - mx), axis=1)) + mx[:, 0]
    picked = jnp.take_along_axis(
        pl, jnp.maximum(y_pitch, 0)[:, None], axis=1)[:, 0]
    ce = (logz - picked) * mask
    pitch_loss = jnp.sum(ce) / jnp.maximum(jnp.sum(mask), 1.0)
    return onset_loss + pitch_loss


def train(x, y_onset, y_pitch, steps=3000, batch=512, lr=2e-3, seed=0,
          log_every=0, weight_decay=1e-4, input_noise=0.15):
    """Train on precomputed frames; returns numpy params dict.

    weight_decay (AdamW) and input_noise (gaussian jitter on the raw
    log-filterbank features, in log-energy units) close most of the
    train≪val generalization gap the round-3 model showed."""
    import jax
    import jax.numpy as jnp
    import optax

    params = init_params(seed)
    # Per-bin standardization (x rows are CONTEXT stacked frames). The
    # std is FLOORED at 0.25: bins that are near-constant in training
    # (e.g. sub-audio bands holding only the log-epsilon floor) would
    # otherwise turn any out-of-distribution energy into standardized
    # values in the thousands and saturate the heads.
    per_bin = x.reshape(-1, CONTEXT, N_BINS)[:, CONTEXT // 2, :]
    params["feat_mean"] = per_bin.mean(axis=0).astype(np.float32)
    params["feat_std"] = np.maximum(per_bin.std(axis=0),
                                    0.25).astype(np.float32)
    train_keys = [k for k in params if not k.startswith("feat_")]

    pj = {k: jnp.asarray(v) for k, v in params.items()}
    opt = optax.adamw(optax.cosine_decay_schedule(lr, steps, 0.01),
                      weight_decay=weight_decay)
    opt_state = opt.init({k: pj[k] for k in train_keys})

    @jax.jit
    def step(pj, opt_state, xb, ob, pb):
        def lf(trainable):
            full = dict(pj)
            full.update(trainable)
            return loss_fn(full, xb, ob, pb)

        trainable = {k: pj[k] for k in train_keys}
        loss, grads = jax.value_and_grad(lf)(trainable)
        updates, opt_state = opt.update(grads, opt_state, trainable)
        new = optax.apply_updates(trainable, updates)
        pj2 = dict(pj)
        pj2.update(new)
        return pj2, opt_state, loss

    rng = np.random.default_rng(seed)
    x = jnp.asarray(x)
    y_onset = jnp.asarray(y_onset.astype(np.float32))
    y_pitch = jnp.asarray(y_pitch.astype(np.int32))
    n = x.shape[0]
    for s in range(steps):
        sel = rng.integers(0, n, size=min(batch, n))
        xb = x[jnp.asarray(sel)]
        if input_noise:
            xb = xb + jnp.asarray(
                rng.normal(0.0, input_noise,
                           size=(len(sel), x.shape[1])).astype(np.float32))
        pj, opt_state, loss = step(pj, opt_state, xb,
                                   y_onset[jnp.asarray(sel)],
                                   y_pitch[jnp.asarray(sel)])
        if log_every and s % log_every == 0:
            print(f"step {s}: loss {float(loss):.4f}")
    return {k: np.asarray(v) for k, v in pj.items()}


def save_params(params, path=_DATA):
    np.savez_compressed(path, **params)


def load_params(path=_DATA):
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def predict(params, audio, sr):
    """(onset_prob (n_frames,), pitch_logits (n_frames, P), hop_s)."""
    import jax
    import jax.numpy as jnp

    feats = features(audio, sr)
    xs = context_windows(feats)
    pj = {k: jnp.asarray(v) for k, v in params.items()}
    ol, pl = jax.jit(forward)(pj, jnp.asarray(xs))
    frame, hop = frame_params(sr)
    return (np.asarray(jax.nn.sigmoid(ol)), np.asarray(pl), hop / sr)


def nn_extract_notes(audio, sr, params=None, min_duration=0.25,
                     onset_threshold=0.6, min_gap_s=0.2,
                     pitch_skip_s=0.12, pitch_span_s=0.55,
                     energy_veto_db=0.0):
    """Model-based drop-in for calib.notes.extract_notes.

    min_gap_s merges the duplicate posterior peaks the soft wurli attack
    produces (~0.2 s apart); the pitch window SKIPS the attack region
    (pitch_skip_s) where the posterior is least reliable and reads the
    early sustain instead — both measured decode wins on the shipped
    model. energy_veto_db (>0) rejects posterior peaks with no broadband
    energy RISE around them — useful against posterior ripples on SPARSE
    material, but OFF by default: a −12 dB note under three ringing
    louder notes adds <1 dB of broadband energy, and on dense 4-note
    validation mixtures a 1 dB veto cost 46 of 61 recoveries (measured,
    tools/train_onset_model.py).
    Returns the same note-dict schema (onset_s/offset_s/
    midi_note/f0_hz/velocity_norm); empty list when no trained weights
    are available.
    """
    params = params if params is not None else load_params()
    if params is None:
        return []
    audio = np.asarray(audio, dtype=np.float64)
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    prob, pitch_logits, hop_s = predict(params, audio, sr)
    n = len(prob)
    # broadband frame energy (dB-ish) from the same filterbank features
    feats = features(audio, sr)
    energy = 20.0 / np.log(10.0) * np.log(
        np.maximum(np.exp(feats).sum(axis=1), 1e-12))
    min_gap = max(1, int(min_gap_s / hop_s))
    peaks = []
    for i in range(1, n - 1):
        if (prob[i] >= onset_threshold and prob[i] >= prob[i - 1]
                and prob[i] > prob[i + 1]):
            if energy_veto_db > 0.0:
                pre = energy[max(i - 4, 0):max(i - 1, 1)]
                post = energy[i:min(i + 4, n)]
                if (len(pre) and len(post)
                        and post.max() < np.median(pre) + energy_veto_db):
                    continue
            if not peaks or i - peaks[-1] >= min_gap:
                peaks.append(i)
    notes = []
    bounds = peaks + [n]
    peak_global = max(np.abs(audio).max(), 1e-12)
    skip = max(0, int(pitch_skip_s / hop_s))
    span = max(1, int(pitch_span_s / hop_s))
    for k, i0 in enumerate(peaks):
        i1 = bounds[k + 1]
        onset_s = i0 * hop_s
        offset_s = min(i1 * hop_s, len(audio) / sr)
        if offset_s - onset_s < min_duration:
            continue
        a = min(i0 + skip, max(i1 - 1, i0))
        b = min(i0 + span, i1)
        if b <= a:
            a, b = i0, max(i0 + 1, i1)
        pl = pitch_logits[a:b].sum(axis=0)
        cls = int(np.argmax(pl[:-1]))          # exclude "none"
        midi = MIDI_LO + cls
        f0 = 440.0 * 2.0 ** ((midi - 69) / 12.0)
        seg = audio[int(onset_s * sr): int(offset_s * sr)]
        vel = float(np.abs(seg[: int(0.05 * sr)]).max()
                    / peak_global) if len(seg) else 0.0
        notes.append({
            "onset_s": float(onset_s),
            "offset_s": float(offset_s),
            "midi_note": midi,
            "f0_hz": float(f0),
            "velocity_norm": min(vel, 1.0),
        })
    return notes
