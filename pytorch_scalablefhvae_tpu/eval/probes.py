"""Disentanglement probes: linear classifiers over extracted latents.

The ScalableFHVAE papers evaluate disentanglement by how well simple
classifiers recover *sequence-level* factors (speaker identity) from each
latent: z2 should be highly predictive of the speaker, z1 should not
(arXiv 1709.07902 §5). This module implements that diagnostic as a jitted
multinomial logistic-regression probe over the per-segment posterior means
produced by ``eval/latents.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax


def default_speaker_of(seq_key: str) -> str:
    """Speaker id from an utterance key.

    TIMIT/synthetic keys are ``<spk>_<utt>`` (preprocess_timit.py:56);
    LibriSpeech uids are ``<spk>-<chapter>-<utt>``.
    """
    if "_" in seq_key:
        return seq_key.split("_")[0]
    return seq_key.split("-")[0]


def json_safe(obj):
    """Replace non-finite floats with None, recursively.

    ``json.dumps`` emits the non-standard ``NaN`` token for such floats —
    invalid JSON that jq / JSON.parse / strict parsers reject — so every
    probe/metrics artifact writer passes its payload through this first.
    """
    if isinstance(obj, dict):
        return {k: json_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [json_safe(v) for v in obj]
    if isinstance(obj, float) and not np.isfinite(obj):
        return None
    return obj


def linear_probe_accuracy(
    feats: np.ndarray,
    labels: np.ndarray,
    train_frac: float = 0.8,
    seed: int = 0,
    steps: int = 300,
    lr: float = 0.05,
    weight_decay: float = 1e-4,
    groups: np.ndarray | None = None,
    overlap_gap: int = 2,
) -> dict:
    """Train a multinomial logistic-regression probe; report accuracies.

    ``groups`` (the owning utterance of each segment, in loader order —
    segments of one utterance are consecutive and time-ordered): when
    given, each utterance splits TEMPORALLY — a train prefix, then
    ``overlap_gap`` dropped boundary segments, then the test suffix.
    Segments are overlapping sliding windows (seg_shift < seg_len:
    adjacent segments share most of their frames), so a random
    segment-level split leaks near-duplicates of every test segment into
    training and the probe scores frame memorization instead of the
    factor under test — inflating exactly the z1 accuracy whose
    near-chance level the diagnostic exists to certify. A whole-utterance
    holdout would over-correct: on splits with one utterance per speaker
    it removes the held-out CLASSES from training entirely. The temporal
    split keeps every class covered while no test frame appears in
    training (default gap 2 covers seg_len 20 / shift 8: segments i, j
    share frames iff |i-j| * shift < seg_len).
    """
    n, d = feats.shape
    n_classes = int(labels.max()) + 1 if n else 0
    rng = np.random.default_rng(seed)
    if groups is not None and n:
        g = np.asarray(groups)
        tr_list, te_list = [], []
        for gval in np.unique(g):
            idx = np.flatnonzero(g == gval)
            m = len(idx)
            # reserve the test TAIL first (at least one segment), then the
            # guard gap backwards — utterances are often only a handful of
            # segments long, and carving train-first would leave the gap
            # nothing to eat but the test set
            te_start = m - max(int(m * (1.0 - train_frac)), 1)
            tr_end = te_start - overlap_gap
            if tr_end <= 0:  # too short to split leak-free: all train
                tr_list.append(idx)
                continue
            tr_list.append(idx[:tr_end])
            te_list.append(idx[te_start:])
        tr = np.concatenate(tr_list) if tr_list else np.zeros(0, np.int64)
        te = np.concatenate(te_list) if te_list else np.zeros(0, np.int64)
    else:
        order = rng.permutation(n)
        n_train = max(int(n * train_frac), 1)
        tr, te = order[:n_train], order[n_train:]

    # standardize with TRAIN-split statistics only (test rows must not
    # shape the preprocessing they are scored under)
    mu = feats[tr].mean(0) if len(tr) else np.zeros(d)
    sd = feats[tr].std(0) if len(tr) else np.ones(d)
    x = jnp.asarray((feats - mu) / (sd + 1e-6), jnp.float32)
    y = jnp.asarray(labels, jnp.int32)

    params = {
        "w": jnp.zeros((d, n_classes), jnp.float32),
        "b": jnp.zeros((n_classes,), jnp.float32),
    }
    opt = optax.adamw(lr, weight_decay=weight_decay)

    xtr, ytr = x[tr], y[tr]

    @jax.jit
    def fit(params):
        opt_state = opt.init(params)

        def body(_, carry):
            params, opt_state = carry

            def loss_fn(p):
                logits = xtr @ p["w"] + p["b"]
                return optax.softmax_cross_entropy_with_integer_labels(logits, ytr).mean()

            grads = jax.grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        params, _ = jax.lax.fori_loop(0, steps, body, (params, opt_state))
        return params

    params = fit(params)

    @jax.jit
    def acc(idx):
        logits = x[idx] @ params["w"] + params["b"]
        return jnp.mean((jnp.argmax(logits, -1) == y[idx]).astype(jnp.float32))

    return {
        "train_acc": float(acc(jnp.asarray(tr))) if len(tr) else float("nan"),
        "test_acc": float(acc(jnp.asarray(te))) if len(te) else float("nan"),
        "n_classes": n_classes,
        "n_examples": int(n),
        "chance": 1.0 / max(n_classes, 1),
    }


def speaker_probes(
    latents: dict,
    seq_keys: list[str],
    speaker_of=default_speaker_of,
    seed: int = 0,
) -> dict:
    """Run the speaker probe on both latents.

    ``latents``: dict with ``z1_mu`` [N, d1], ``z2_mu`` [N, d2],
    ``seq_idx`` [N]; ``seq_keys``: index -> utterance key.

    A disentangled model shows high z2 accuracy and near-chance z1 accuracy.
    """
    speakers = [speaker_of(k) for k in seq_keys]
    spk_ids = {s: i for i, s in enumerate(sorted(set(speakers)))}
    labels = np.asarray([spk_ids[speakers[i]] for i in latents["seq_idx"]], np.int64)
    # temporal per-utterance split: a random segment split would leak
    # overlapping windows of every test segment into training and score
    # frame memorization, not speaker information
    groups = np.asarray(latents["seq_idx"])
    return {
        "z1_speaker_probe": linear_probe_accuracy(
            latents["z1_mu"], labels, seed=seed, groups=groups),
        "z2_speaker_probe": linear_probe_accuracy(
            latents["z2_mu"], labels, seed=seed, groups=groups),
        "num_speakers": len(spk_ids),
    }
