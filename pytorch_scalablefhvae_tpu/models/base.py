"""Shared FHVAE model machinery: ELBO assembly and discriminative objective.

Implements the *intended* math of the reference's ``SimpleFHVAE.forward``
(simple_fhvae.py:71-124), with the catalogued defects fixed (SURVEY.md §8):

- B7: the mu2 posterior-mean table is a persistent, learnable ``[num_seqs,
  z2_dim]`` parameter in the model pytree (trained by the optimizer,
  checkpointed, shardable) instead of fresh noise per step;
- B8: no stop-gradients — the reconstruction term trains the decoder and
  log p(mu2) trains the table;
- B9: the discriminative term enters the objective as ``+log q(y | z2)``
  (per-segment log-softmax at the true sequence), so the loss
  ``-mean(lb + alpha * log_qy)`` *attracts* z2 to its sequence's mu2.

Generative model (arXiv 1709.07902 §3): pz1 = N(0, I); pmu2 = N(0, I);
pz2 = N(mu2, pz2_std^2 I); px|z = N(dec_mu(z1,z2), diag(exp(dec_logvar))).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_scalablefhvae_tpu.models.layers import kld, log_gauss


class FHVAEOutputs(NamedTuple):
    """Per-segment model outputs; field order matches the reference's return
    tuple (simple_fhvae.py:124)."""

    lower_bound: jnp.ndarray  # [B]
    log_qy: jnp.ndarray  # [B] discriminative log q(y|z2) (log-softmax at y)
    log_px_z: jnp.ndarray  # [B]
    neg_kld_z1: jnp.ndarray  # [B]
    neg_kld_z2: jnp.ndarray  # [B]
    log_pmu2: jnp.ndarray  # [B]
    # extras for evaluation / mu2 estimation (not in the reference tuple)
    z1_mu: jnp.ndarray  # [B, z1_dim]
    z2_mu: jnp.ndarray  # [B, z2_dim]
    x_mu: jnp.ndarray  # [B, T, F] reconstruction mean
    x_logvar: jnp.ndarray  # [B, T, F]


def discriminative_log_qy(
    z2_mu: jnp.ndarray,
    mu2_table: jnp.ndarray,
    seq_idx: jnp.ndarray,
    pz2_logvar: float,
    use_pallas: str = "never",
    num_real: int | None = None,
    mesh=None,
) -> jnp.ndarray:
    """log q(y | z2) under logits ``-||z2_mu - mu2[s]||^2 / (2 sigma^2)``.

    (simple_fhvae.py:119-122, with the CE sign corrected.) Written via the
    squared-norm expansion so the all-sequences term is one ``[B, d] x [d, N]``
    matmul on the MXU instead of a broadcast ``[B, N, d]`` intermediate.

    The log-softmax over N is algebraically independent of the ``||z2_mu||^2``
    term (constant in s), so it is dropped.

    ``num_real``: count of real table rows. When the table is padded (rows
    rounded up to a multiple of the mesh's model axis;
    ``parallel.mesh.padded_num_seqs``), padded rows are masked out of the
    log-sum-exp so the objective is exactly the unpadded one.

    ``use_pallas``: "never" | "always" | "auto". "auto" selects the streaming
    Pallas kernel (ops/discriminative.py) whenever running on TPU — measured
    on v5e (host-synced timing, K=64 step bundling) it matches or beats
    XLA's fused matmul+softmax at every table size (1.06x at N=4.6k, 1.36x
    at N=100k, 1.74x at N=281k) while keeping HBM at O(B*D + N*D) instead of
    the materialized ``[B, N]`` logits. When ``mesh`` is given the Pallas
    path runs per-shard under ``shard_map`` with a collective LSE combine,
    so it composes with data- and model-axis sharding; the jnp form remains
    as the GSPMD-partitionable fallback and the non-TPU path.
    """
    n = mu2_table.shape[0]
    num_real = n if num_real is None else int(num_real)
    if use_pallas == "always" or (
        use_pallas == "auto" and jax.default_backend() == "tpu"
    ):
        from pytorch_scalablefhvae_tpu.ops.discriminative import (
            discriminative_log_qy_pallas,
            discriminative_log_qy_pallas_sharded,
        )

        interpret = jax.default_backend() != "tpu"
        if mesh is not None:
            return discriminative_log_qy_pallas_sharded(
                z2_mu, mu2_table, seq_idx, float(pz2_logvar), mesh,
                num_real=num_real, interpret=interpret,
            )
        return discriminative_log_qy_pallas(
            z2_mu, mu2_table, seq_idx, float(pz2_logvar),
            num_real=num_real, interpret=interpret,
        )

    inv_two_var = 0.5 / np.exp(pz2_logvar)
    cross = jnp.dot(z2_mu, mu2_table.T, preferred_element_type=jnp.float32)  # [B, N]
    sq_norms = jnp.sum(mu2_table * mu2_table, axis=-1)  # [N]
    logits = inv_two_var * (2.0 * cross - sq_norms[None, :])
    if num_real < n:
        logits = jnp.where(jnp.arange(n)[None, :] < num_real, logits, -1e30)
    return jax.nn.log_softmax(logits, axis=-1)[jnp.arange(z2_mu.shape[0]), seq_idx]


def assemble_elbo(
    x: jnp.ndarray,
    mu2: jnp.ndarray,
    z1_mu: jnp.ndarray,
    z1_logvar: jnp.ndarray,
    z2_mu: jnp.ndarray,
    z2_logvar: jnp.ndarray,
    x_mu: jnp.ndarray,
    x_logvar: jnp.ndarray,
    nsegs: jnp.ndarray,
    *,
    pz2_logvar: float,
    frame_axes: tuple[int, int] = (1, 2),
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-segment ELBO terms (simple_fhvae.py:106-116, detaches removed).

    ``lower_bound = log p(x|z) - KL(q(z1)||p(z1)) - KL(q(z2)||p(z2|mu2))
                    + log p(mu2) / nsegs``
    where the mu2 prior term is amortized over the owning sequence's segment
    count (the "scalable" per-segment bound of arXiv 1804.03201 eq. 5).

    ``frame_axes``: the (time, feature) axes of ``x``/``x_mu``/``x_logvar``
    to reduce for the reconstruction term — ``(1, 2)`` for batch-major
    ``[B, T, F]``, ``(0, 2)`` for the recurrent model's time-major
    ``[T, B, F]`` fused path (models/fhvae.py).
    """
    log_pmu2 = jnp.sum(log_gauss(mu2, 0.0, 0.0), axis=-1)
    neg_kld_z2 = -jnp.sum(kld(z2_mu, z2_logvar, mu2, pz2_logvar), axis=-1)
    neg_kld_z1 = -jnp.sum(kld(z1_mu, z1_logvar, 0.0, 0.0), axis=-1)
    log_px_z = jnp.sum(log_gauss(x, x_mu, x_logvar), axis=frame_axes)
    lower_bound = log_px_z + neg_kld_z1 + neg_kld_z2 + log_pmu2 / nsegs
    return lower_bound, log_px_z, neg_kld_z1, neg_kld_z2, log_pmu2


def init_mu2_table(
    key: jax.Array, num_seqs: int, z2_dim: int, init_std: float = 1.0
) -> jnp.ndarray:
    return init_std * jax.random.normal(key, (num_seqs, z2_dim), jnp.float32)


def resolve_mu2_scoring(model, params: dict, mu2_table):
    """The ONE mu2-table selection rule every model forward shares.

    Returns ``(mu2_table, num_real, mesh, use_pallas)`` for the
    discriminative softmax. Without an override, the LEARNED table scores
    with the model's padding/sharding/kernel settings. Override tables
    (per-split MAP estimates for held-out sequences, eval_model.py's
    intended procedure) are unpadded, replicated, and unsharded — and when
    the model is mesh-compiled, the unwrapped Pallas kernel has no GSPMD
    partitioning rule, so the partitionable jnp path must score them.
    """
    if mu2_table is None:
        return (params["mu2_table"], model.num_seqs, model.shard_mesh,
                model.use_pallas)
    return (mu2_table, mu2_table.shape[0], None,
            "never" if model.shard_mesh is not None else model.use_pallas)


# the exact key set of the metrics dict loss_from_outputs returns — the
# mesh-compiled steps (parallel/sharded_step.py) build their out_shardings
# pytree from this, so adding/renaming a metric cannot silently break only
# the mesh path with an out_shardings structure mismatch
METRIC_KEYS = ("loss", "lower_bound", "log_qy", "log_px_z",
               "neg_kld_z1", "neg_kld_z2", "log_pmu2")


def loss_from_outputs(
    out: FHVAEOutputs, weight: jnp.ndarray, alpha: float
) -> tuple[jnp.ndarray, dict]:
    """Training loss ``-mean(lower_bound + alpha * log_qy)`` over real rows.

    (reference ``loss_function``, train_model.py:243-251, with log_qy entering
    with its correct sign and padded rows masked out; keys: ``METRIC_KEYS``.)
    """
    denom = jnp.maximum(jnp.sum(weight), 1.0)

    def wmean(v):
        return jnp.sum(v * weight) / denom

    loss = -wmean(out.lower_bound + alpha * out.log_qy)
    metrics = {
        "loss": loss,
        "lower_bound": wmean(out.lower_bound),
        "log_qy": wmean(out.log_qy),
        "log_px_z": wmean(out.log_px_z),
        "neg_kld_z1": wmean(out.neg_kld_z1),
        "neg_kld_z2": wmean(out.neg_kld_z2),
        "log_pmu2": wmean(out.log_pmu2),
    }
    return loss, metrics


def build_model(model_type: str, input_size: int, cfg, num_seqs: int, feat_dim: int | None = None):
    """Factory covering the reference's model registry
    (train_model.py:400-407, utils.py:74-83)."""
    from pytorch_scalablefhvae_tpu.models.fhvae import FHVAE
    from pytorch_scalablefhvae_tpu.models.simple_fhvae import SimpleFHVAE

    if model_type == "simple_fhvae":
        return SimpleFHVAE.from_config(input_size, cfg, num_seqs)
    if model_type == "fhvae":
        return FHVAE.from_config(input_size, cfg, num_seqs, feat_dim=feat_dim or 80)
    raise ValueError(f"Unknown model_type {model_type!r}")
