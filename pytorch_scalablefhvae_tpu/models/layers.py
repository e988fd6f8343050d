"""Functional neural-net building blocks (pure pytree params).

Capability parity with the reference's module zoo (simple_fhvae.py:127-244:
``VariableLinearLayer``, ``LatentSegPreEncoder``, ``LatentSeqPreEncoder``,
``GaussianLayer``, ``PreDecoder``) but expressed as init/apply function pairs
over plain dict pytrees — the idiomatic JAX shape, friendly to jit, grad,
shardings, and Pallas kernel swaps.

Initialization: Glorot-uniform weights, zero biases. (The reference imported
``xavier_uniform_`` but never applied it, falling back to torch's per-layer
default; Glorot is the intended choice and trains better.)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


def init_dense(key: jax.Array, d_in: int, d_out: int, dtype=jnp.float32) -> Params:
    limit = np.sqrt(6.0 / (d_in + d_out))
    w = jax.random.uniform(key, (d_in, d_out), dtype, -limit, limit)
    return {"w": w, "b": jnp.zeros((d_out,), dtype)}


def dense(p: Params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    w, b = p["w"], p["b"]
    if compute_dtype is not None and compute_dtype != w.dtype:
        # bf16 matmul on the MXU, fp32 accumulate + params
        y = jnp.dot(
            x.astype(compute_dtype), w.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b


def init_mlp(key: jax.Array, d_in: int, hus: Sequence[int], dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, len(hus))
    layers = []
    d = d_in
    for k, h in zip(keys, hus):
        layers.append(init_dense(k, d, h, dtype))
        d = h
    return {"layers": layers}


def mlp(p: Params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """ReLU MLP; parity with the reference's stacked ``VariableLinearLayer``."""
    for layer in p["layers"]:
        x = jax.nn.relu(dense(layer, x, compute_dtype))
    return x


def init_gauss_head(key: jax.Array, d_in: int, dim: int, dtype=jnp.float32) -> Params:
    k_mu, k_lv = jax.random.split(key)
    return {"mu": init_dense(k_mu, d_in, dim, dtype), "logvar": init_dense(k_lv, d_in, dim, dtype)}


LOGVAR_BOUND = 9.0


def gauss_head(
    p: Params, x: jnp.ndarray, key: jax.Array, compute_dtype=None, sample: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gaussian layer (simple_fhvae.py:193-216): mu/logvar heads + sample.

    Reparameterized draw with an explicit PRNG key (the reference relied on
    torch's implicit global RNG, ``torch.randn_like``).

    Deviation from the reference (documented, SURVEY.md §7 hard-part 5): the
    raw logvar head is softly bounded to ±LOGVAR_BOUND with a tanh so
    ``exp(±logvar)`` terms in the ELBO cannot overflow/underflow fp32 — the
    reference's unbounded head diverges to NaN within an epoch on
    un-normalized features (it trained in fp64 and was never run to
    completion; TPUs have no fp64).
    """
    mu = dense(p["mu"], x, compute_dtype)
    logvar = dense(p["logvar"], x, compute_dtype)
    logvar = LOGVAR_BOUND * jnp.tanh(logvar / LOGVAR_BOUND)
    if sample:
        eps = jax.random.normal(key, mu.shape, mu.dtype)
        z = mu + eps * jnp.exp(0.5 * logvar)
    else:
        z = mu
    return mu, logvar, z


# ---- Gaussian math (simple_fhvae.py:56-69 closed forms) ----

_LOG_2PI = float(np.log(2.0 * np.pi))


def log_gauss(x, mu=0.0, logvar=0.0):
    """log N(x; mu, exp(logvar)), elementwise."""
    return -0.5 * (_LOG_2PI + logvar + jnp.square(x - mu) / jnp.exp(logvar))


def kld(p_mu, p_logvar, q_mu, q_logvar):
    """D_KL(N(p_mu, e^p_logvar) || N(q_mu, e^q_logvar)), elementwise."""
    return -0.5 * (
        1.0 + p_logvar - q_logvar
        - (jnp.square(p_mu - q_mu) + jnp.exp(p_logvar)) / jnp.exp(q_logvar)
    )
