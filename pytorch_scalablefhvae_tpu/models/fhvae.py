"""FHVAE: recurrent (LSTM) factorized hierarchical VAE.

The reference left this model as a stub (fhvae.py:5-14,
``raise NotImplementedError``). This implements the intended recurrent
architecture of the original ScalableFHVAE papers (arXiv 1709.07902 §3.1,
1804.03201): LSTM encoders that consume the segment frame-by-frame and LSTM
decoder that emits per-frame Gaussians, sharing the latent structure, mu2
table, and discriminative objective with :class:`SimpleFHVAE`.

TPU notes: recurrence is ``jax.lax.scan`` over the fixed segment length (a
static 20 for the default config) so XLA unrolls/pipelines it; all gates of a
layer are one fused ``[B, in+h] x [in+h, 4h]`` matmul per step on the MXU.
Hyperparameter mapping: ``z1_hus``/``z2_hus``/``x_hus`` entries are LSTM layer
widths (the constructor signature matches the reference stub's, fhvae.py:5-13).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_scalablefhvae_tpu.models import layers
from pytorch_scalablefhvae_tpu.models.base import (
    FHVAEOutputs,
    assemble_elbo,
    discriminative_log_qy,
    init_mu2_table,
    resolve_mu2_scoring,
)


def init_lstm(key: jax.Array, d_in: int, d_hid: int) -> dict:
    k_w, _ = jax.random.split(key)
    limit = np.sqrt(6.0 / (d_in + d_hid + 4 * d_hid))
    w = jax.random.uniform(k_w, (d_in + d_hid, 4 * d_hid), jnp.float32, -limit, limit)
    b = jnp.zeros((4 * d_hid,), jnp.float32)
    # forget-gate bias 1.0 (standard trainability fix)
    b = b.at[d_hid : 2 * d_hid].set(1.0)
    return {"w": w, "b": b}


def init_lstm_stack(key: jax.Array, d_in: int, widths: tuple[int, ...]) -> dict:
    ks = jax.random.split(key, len(widths))
    cells = []
    d = d_in
    for k, w in zip(ks, widths):
        cells.append(init_lstm(k, d, w))
        d = w
    return {"cells": cells}


def _cell(gates, c):
    """LSTM gate nonlinearity: gates [B, 4H] -> (h_new, c_new)."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def run_lstm_wavefront2(p: dict, xs: jnp.ndarray, cdt=None,
                        unroll: int | bool = True
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two-layer stacked LSTM scheduled as a WAVEFRONT (same math as
    :func:`run_lstm`, shorter dependency chain).

    The sequential formulation runs layer 1 for all T steps, then layer 2 —
    a chain of 2T dependent [B,H]x[H,4H] matmuls, and on a TPU the chain's
    *latency*, not FLOPs, bounds throughput (each recurrent matmul is far too
    small to fill the MXU pipeline). But layer 2's step t-1 only needs layer
    1's output h1[t-1], so the two cells can advance together one diagonal at
    a time: each scan iteration computes layer-1 step t and layer-2 step t-1,
    whose matmuls BOTH read the carried h1 — layer 1's recurrence and layer
    2's input projection fuse into one [B,H]x[H,8H] product, with layer 2's
    recurrence [B,H]x[H,4H] independent beside it. Dependent-chain length
    drops from 2T to T+1 links; measured 1.8x on v5e at the default
    B=256/H=128/T=20 (fwd+bwd train step 290k -> ~520k seg/s).

    Boundary steps (layer-1 step 0, layer-2 step T-1) run outside the scan so
    the body needs no masking.
    """
    B, T, _ = xs.shape
    assert len(p["cells"]) == 2
    c1p, c2p = p["cells"]
    hid = c1p["w"].shape[1] // 4
    d_in = c1p["w"].shape[0] - hid
    w1x, w1h = c1p["w"][:d_in], c1p["w"][d_in:]
    w2x, w2h = c2p["w"][:hid], c2p["w"][hid:]

    def mm(a, b):
        if cdt is not None:
            return jnp.dot(a.astype(cdt), b.astype(cdt),
                           preferred_element_type=jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    # layer-1 input projection hoisted over all T steps (one MXU matmul)
    xg1 = mm(xs.reshape(B * T, d_in), w1x).reshape(B, T, 4 * hid) + c1p["b"]
    # fused weights: carried h1 feeds layer 1's gates AND layer 2's input
    w1h_w2x = jnp.concatenate([w1h, w2x], axis=1)  # [H, 8H]

    zeros = jnp.zeros((B, hid), jnp.float32)
    # layer-1 step 0 (outside the scan: its gates need no carried h)
    h1, c1 = _cell(xg1[:, 0], zeros)
    h2, c2 = zeros, zeros

    def step(carry, xg1_t):
        h1, c1, h2, c2 = carry
        both = mm(h1, w1h_w2x)  # [B, 8H]: layer-1 recurrence | layer-2 input
        g1 = xg1_t + both[:, : 4 * hid]
        g2 = both[:, 4 * hid :] + c2p["b"] + mm(h2, w2h)
        h1n, c1n = _cell(g1, c1)
        h2n, c2n = _cell(g2, c2)
        return (h1n, c1n, h2n, c2n), h2n

    if not isinstance(unroll, bool):
        unroll = max(1, min(int(unroll), max(T - 1, 1)))
    (h1, c1, h2, c2), tops = jax.lax.scan(
        step, (h1, c1, h2, c2), jnp.swapaxes(xg1[:, 1:], 0, 1), unroll=unroll
    )
    # layer-2 final step (consumes layer 1's last output)
    g2 = mm(h1, w2x) + c2p["b"] + mm(h2, w2h)
    h2, c2 = _cell(g2, c2)
    seq = jnp.concatenate(
        [jnp.swapaxes(tops, 0, 1), h2[:, None, :]], axis=1
    )
    return seq, h2


def _two_layer_ok(p: dict, T: int) -> bool:
    """Whether a stack qualifies for the fused Pallas recurrence: two
    equal-width layers and at least two steps."""
    return (
        len(p["cells"]) == 2
        and p["cells"][0]["w"].shape[1] == p["cells"][1]["w"].shape[1]
        and p["cells"][1]["w"].shape[0]
        == 2 * (p["cells"][1]["w"].shape[1] // 4)
        and T >= 2
    )


def run_lstm(
    p: dict, xs: jnp.ndarray, cdt=None, unroll: int | bool = 1,
    use_pallas: str = "never", mm_dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run a stacked LSTM over ``xs [B, T, D]``.

    Returns (all-layer-top hidden states [B, T, H_last], last hidden [B, H_last]).

    Two-layer stacks (the reference default) dispatch to the wavefront
    schedule (:func:`run_lstm_wavefront2`), which halves the dependent-matmul
    chain, or — when ``use_pallas`` selects it ("always", or "auto" on a TPU
    backend) — to the fused Pallas recurrence (ops/lstm_pallas.py), which
    runs the whole two-layer scan in one kernel with VMEM-resident carries
    and a custom reverse-time backward kernel. The generic path below
    handles other depths.

    TPU scheduling: the input-to-gates projection of each layer is hoisted
    out of the recurrence as one ``[B*T, D] x [D, 4H]`` MXU matmul; only the
    ``[B, H] x [H, 4H]`` recurrent product runs inside ``lax.scan``. Same
    math as the fused cell, ~T-fold fewer small matmuls on the critical path.

    ``unroll``: passed to ``lax.scan``. Segments are short (T=20 by default)
    and the recurrent matmul is tiny, so the scan's per-step loop overhead is
    a real cost; unrolling lets XLA software-pipeline consecutive steps.
    """
    two_layer = _two_layer_ok(p, xs.shape[1])
    if two_layer and (
        use_pallas == "always"
        or (use_pallas == "auto" and jax.default_backend() == "tpu")
    ):
        from pytorch_scalablefhvae_tpu.ops.lstm_pallas import (
            LSTM2_VMEM_BUDGET,
            lstm2_pallas,
            lstm2_vmem_bytes,
        )

        hid = p["cells"][0]["w"].shape[1] // 4
        # lstm2_pallas dispatches to the PROJECTION-FUSED kernel, so the
        # gate must include the input-width term (lstm2_vmem_bytes: "gates
        # for the proj kernel MUST pass the input width") — without d_in a
        # wide-feature model passes here and fails Mosaic compilation
        over_budget = lstm2_vmem_bytes(
            hid, xs.shape[0], d_in=xs.shape[2]) > LSTM2_VMEM_BUDGET
        if use_pallas == "always" or not over_budget:
            if use_pallas == "always" and jax.default_backend() != "tpu":
                import warnings

                warnings.warn(
                    "--lstm-pallas=always on a non-TPU backend runs the "
                    "recurrence kernel in Pallas INTERPRET mode (orders of "
                    "magnitude slower than the scan path); use 'auto' to "
                    "gate on the backend.", RuntimeWarning, stacklevel=2)
            return lstm2_pallas(p, xs, cdt,
                                interpret=jax.default_backend() != "tpu",
                                mm_dtype=mm_dtype)
        # "auto" + wide stack: the backward kernel's VMEM-resident weight
        # grads would blow the budget and fail to compile — scan instead
    if two_layer:
        return run_lstm_wavefront2(p, xs, cdt, unroll=unroll)
    B, T, _ = xs.shape
    if not isinstance(unroll, bool):
        unroll = max(1, min(int(unroll), T))
    seq = xs
    last_h = None
    for cell in p["cells"]:
        hid = cell["w"].shape[1] // 4
        d_in = cell["w"].shape[0] - hid
        w_x, w_h = cell["w"][:d_in], cell["w"][d_in:]
        # batch-major projection + explicit swapaxes measured faster on v5e
        # than projecting straight to a time-major [T, B, 4H] einsum output
        # (235k vs 220k seg/s at B=256/H=128): XLA fuses the transpose into
        # the projection, while the time-major output forces a strided layout
        if cdt is not None:
            xg = jnp.einsum("btd,dh->bth", seq.astype(cdt), w_x.astype(cdt),
                            preferred_element_type=jnp.float32) + cell["b"]
        else:
            xg = jnp.einsum("btd,dh->bth", seq, w_x,
                            preferred_element_type=jnp.float32) + cell["b"]

        def step(carry, xg_t, w_h=w_h):
            h, c = carry
            if cdt is not None:
                gates = xg_t + jnp.dot(h.astype(cdt), w_h.astype(cdt),
                                       preferred_element_type=jnp.float32)
            else:
                gates = xg_t + jnp.dot(h, w_h, preferred_element_type=jnp.float32)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        init = (jnp.zeros((B, hid), jnp.float32), jnp.zeros((B, hid), jnp.float32))
        (last_h, _), tops = jax.lax.scan(step, init, jnp.swapaxes(xg, 0, 1), unroll=unroll)
        seq = jnp.swapaxes(tops, 0, 1)
    return seq, last_h


@dataclass(frozen=True)
class FHVAE:
    """Recurrent FHVAE; same public surface as :class:`SimpleFHVAE`."""

    input_size: int  # T * F of a segment (kept for constructor parity)
    z1_hus: tuple[int, ...] = (128, 128)
    z2_hus: tuple[int, ...] = (128, 128)
    z1_dim: int = 16
    z2_dim: int = 16
    x_hus: tuple[int, ...] = (128, 128)
    num_seqs: int = 1
    pz2_std: float = 0.5
    mu2_init_std: float = 1.0
    compute_dtype: str = "float32"
    use_pallas: str = "auto"
    # fused Pallas recurrence for the three 2-layer LSTM stacks
    # (ops/lstm_pallas.py); independent of use_pallas (the discriminative
    # softmax kernel) because the two win in different regimes
    lstm_pallas: str = "auto"
    # matmul operand dtype INSIDE the Pallas recurrence (weights + hidden
    # states; gates/carries/accumulation stay fp32). bfloat16 runs the MXU
    # single-pass (~3x the fp32 multi-pass rate) and is the TPU default;
    # "float32" restores bit-exact parity with the scan path. Only affects
    # the Pallas path.
    lstm_mm_dtype: str = "bfloat16"
    feat_dim: int = 80  # frames arrive as [B, T, feat_dim]
    # lax.scan unroll factor for the LSTM recurrences (see run_lstm); the
    # default fully unrolls the reference's 20-frame segments
    scan_unroll: int = 20
    # see SimpleFHVAE: mu2 rows padded to a multiple of the mesh model axis
    num_seqs_padded: int | None = None
    shard_mesh: object = None

    model_type = "fhvae"

    @property
    def table_rows(self) -> int:
        return self.num_seqs_padded or self.num_seqs

    @classmethod
    def from_config(cls, input_size: int, cfg, num_seqs: int, feat_dim: int = 80) -> "FHVAE":
        return cls(
            input_size=input_size,
            z1_hus=tuple(cfg.z1_hus),
            z2_hus=tuple(cfg.z2_hus),
            z1_dim=cfg.z1_dim,
            z2_dim=cfg.z2_dim,
            x_hus=tuple(cfg.x_hus),
            num_seqs=num_seqs,
            pz2_std=cfg.pz2_std,
            mu2_init_std=cfg.mu2_init_std,
            compute_dtype=cfg.compute_dtype,
            use_pallas=getattr(cfg, "use_pallas", "auto"),
            lstm_pallas=getattr(cfg, "lstm_pallas", "auto"),
            lstm_mm_dtype=getattr(cfg, "lstm_mm_dtype", "bfloat16"),
            scan_unroll=getattr(cfg, "scan_unroll", 20),
            feat_dim=feat_dim,
        )

    @property
    def pz2_logvar(self) -> float:
        return float(np.log(self.pz2_std**2))

    @property
    def _cdt(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    @property
    def _mm(self):
        return None if self.lstm_mm_dtype == "float32" else jnp.dtype(
            self.lstm_mm_dtype)

    @property
    def _lstm_pallas_eff(self) -> str:
        """``lstm_pallas`` as the kernel gates should see it: "auto"
        resolves to the scan path when the model is mesh-compiled — an
        unwrapped ``pallas_call`` has no GSPMD partitioning rule, so inside
        a pjit with batch arrays sharded over "data" it would fail to
        partition (or silently replicate, all-gathering the batch onto
        every device). The scan/einsum path partitions cleanly; "always"
        remains an explicit user override (single-device programs under a
        mesh, tests)."""
        if self.lstm_pallas == "auto" and self.shard_mesh is not None:
            return "never"
        return self.lstm_pallas

    def init(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 7)
        return {
            "z2_lstm": init_lstm_stack(ks[0], self.feat_dim, self.z2_hus),
            "z2_gauss": layers.init_gauss_head(ks[1], self.z2_hus[-1], self.z2_dim),
            "z1_lstm": init_lstm_stack(ks[2], self.feat_dim + self.z2_dim, self.z1_hus),
            "z1_gauss": layers.init_gauss_head(ks[3], self.z1_hus[-1], self.z1_dim),
            "dec_lstm": init_lstm_stack(ks[4], self.z1_dim + self.z2_dim, self.x_hus),
            "dec_gauss": layers.init_gauss_head(ks[5], self.x_hus[-1], self.feat_dim),
            "mu2_table": init_mu2_table(ks[6], self.table_rows, self.z2_dim, self.mu2_init_std),
        }

    def encode(self, params: dict, x: jnp.ndarray, key: jax.Array, sample: bool = True) -> dict:
        cdt = self._cdt
        k2, k1 = jax.random.split(key)

        _, h2 = run_lstm(params["z2_lstm"], x, cdt, self.scan_unroll,
                         self._lstm_pallas_eff, self._mm)
        z2_mu, z2_logvar, z2 = layers.gauss_head(params["z2_gauss"], h2, k2, cdt, sample)

        T = x.shape[1]
        z2_tiled = jnp.broadcast_to(z2[:, None, :], (x.shape[0], T, z2.shape[-1]))
        _, h1 = run_lstm(params["z1_lstm"], jnp.concatenate([x, z2_tiled], axis=-1),
                         cdt, self.scan_unroll, self._lstm_pallas_eff, self._mm)
        z1_mu, z1_logvar, z1 = layers.gauss_head(params["z1_gauss"], h1, k1, cdt, sample)
        return {
            "z1_mu": z1_mu, "z1_logvar": z1_logvar, "z1": z1,
            "z2_mu": z2_mu, "z2_logvar": z2_logvar, "z2": z2,
        }

    def decode(
        self,
        params: dict,
        z1: jnp.ndarray,
        z2: jnp.ndarray,
        key: jax.Array | None = None,
        sample: bool = False,
        out_shape: tuple[int, int] | None = None,
        num_frames: int | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Decode [z1, z2] into per-frame Gaussians over ``T`` frames."""
        cdt = self._cdt
        if num_frames is None:
            num_frames = out_shape[0] if out_shape else self.input_size // self.feat_dim
        B = z1.shape[0]
        z = jnp.concatenate([z1, z2], axis=-1)
        z_seq = jnp.broadcast_to(z[:, None, :], (B, num_frames, z.shape[-1]))
        tops, _ = run_lstm(params["dec_lstm"], z_seq, cdt, self.scan_unroll,
                           self._lstm_pallas_eff, self._mm)
        flat = tops.reshape(B * num_frames, -1)
        if key is None:
            key = jax.random.PRNGKey(0)
        x_mu, x_logvar, x_sample = layers.gauss_head(params["dec_gauss"], flat, key, cdt, sample)
        shape = (B, num_frames, self.feat_dim)
        return x_mu.reshape(shape), x_logvar.reshape(shape), x_sample.reshape(shape)

    def encode_z2(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """Posterior MEAN of the sequence latent only: ``[B, z2_dim]``.

        The MAP mu2 passes (device_step.make_device_map_pass,
        loop.estimate_split_mu2) need only ``z2_mu``: running the z2 trunk
        alone is ~3x less compute than the full encoder (no z1 stack, no
        decoder, no logvar/sampling heads). Identical numerics to
        ``encode(...)["z2_mu"]``; uses the time-major Pallas recurrence
        when the stack is kernel-eligible.
        """
        x = x.astype(jnp.float32)
        cdt = self._cdt
        B, T, D = x.shape
        lp = self._lstm_pallas_eff
        use_kernel = (
            lp == "always"
            or (lp == "auto" and jax.default_backend() == "tpu")
        ) and _two_layer_ok(params["z2_lstm"], T)
        if use_kernel and lp == "auto":
            from pytorch_scalablefhvae_tpu.ops.lstm_pallas import (
                LSTM2_VMEM_BUDGET,
                lstm2_vmem_bytes,
            )

            hid = params["z2_lstm"]["cells"][0]["w"].shape[1] // 4
            use_kernel = (lstm2_vmem_bytes(hid, B, d_in=D)
                          <= LSTM2_VMEM_BUDGET)
        if use_kernel:
            from pytorch_scalablefhvae_tpu.ops.lstm_pallas import (
                lstm2_pallas_tm_proj,
            )

            _, h2 = lstm2_pallas_tm_proj(
                params["z2_lstm"], jnp.swapaxes(x, 0, 1), T=T,
                interpret=jax.default_backend() != "tpu", mm_dtype=self._mm)
        else:
            _, h2 = run_lstm(params["z2_lstm"], x, cdt, self.scan_unroll,
                             "never")
        return layers.dense(params["z2_gauss"]["mu"], h2, cdt)

    def _fused_ready(self, params: dict, B: int, T: int) -> bool:
        """Whether the whole-model time-major fused path applies: Pallas
        recurrence selected and all three stacks kernel-eligible within the
        VMEM budget."""
        lp = self._lstm_pallas_eff
        if not (lp == "always" or (
                lp == "auto" and jax.default_backend() == "tpu")):
            return False
        from pytorch_scalablefhvae_tpu.ops.lstm_pallas import (
            LSTM2_VMEM_BUDGET,
            lstm2_vmem_bytes,
        )

        for name in ("z2_lstm", "z1_lstm", "dec_lstm"):
            p = params[name]
            if not _two_layer_ok(p, T):
                return False
            hid = p["cells"][0]["w"].shape[1] // 4
            # z2/z1 run the projection-fused kernel streaming the [bt, D]
            # feature blocks; the decoder's per-step input is one constant
            # [B, 4H] gate block (no x stream), so d_in=0 there. The z1 leg
            # additionally carries a batch-tiled xgc operand (the
            # z2-conditioned gate block) whose backward residency the
            # estimate must include.
            d_in = self.feat_dim if name != "dec_lstm" else 0
            if (lp == "auto"
                    and lstm2_vmem_bytes(hid, B, d_in=d_in,
                                         xgc_tile=name == "z1_lstm")
                    > LSTM2_VMEM_BUDGET):
                return False
        return True

    def _apply_fused(
        self, params, x, seq_idx, nsegs, key, sample, mu2_table,
    ) -> FHVAEOutputs:
        """Time-major fused forward: the hot TPU path.

        Differences from the generic path (same math, fewer bytes moved):
        - all three recurrences run through the time-major Pallas kernel
          (ops/lstm_pallas.py) — ``[T, B, .]`` arrays collapse to its row
          blocks for free, where the batch-major interface forced real
          tiled-layout reshapes around every kernel call;
        - the z1 encoder's input projection is HOISTED AND SPLIT: the
          ``concat([x, z2_tiled])`` of the generic path never materializes —
          ``xg1 = x @ Wx[:D] + (z2 @ Wx[D:] + b)`` with the z2 part computed
          once per segment, not per frame;
        - the decoder's per-step input is the constant ``[z1, z2]``, so its
          projected gates are computed ONCE per segment and the kernel
          revisits the ``[B, 4H]`` block across all T steps — no
          ``[T*B, 4H]`` broadcast in HBM;
        - the ELBO reduces the time-major reconstruction directly
          (``frame_axes=(0, 2)``); ``x_mu`` is transposed back only for the
          output struct (dead code under the training loss, DCE'd by XLA).
        """
        from pytorch_scalablefhvae_tpu.ops.lstm_pallas import (
            lstm2_pallas_tm,
            lstm2_pallas_tm_proj,
        )

        cdt, mm = self._cdt, self._mm
        interp = jax.default_backend() != "tpu"
        B, T, D = x.shape
        k_enc, k_dec = jax.random.split(key)
        k2, k1 = jax.random.split(k_enc)

        def proj(a, w):
            if cdt is not None:
                a, w = a.astype(cdt), w.astype(cdt)
            return jnp.dot(a, w, preferred_element_type=jnp.float32)

        xt = jnp.swapaxes(x, 0, 1)  # [T, B, D], transposed ONCE

        # ---- z2 encoder (projection fused into the kernel: the
        # [T*B, 4H] gate tensor never exists in HBM)
        _, h2 = lstm2_pallas_tm_proj(params["z2_lstm"], xt, T=T,
                                     interpret=interp, mm_dtype=mm)
        z2_mu, z2_logvar, z2 = layers.gauss_head(
            params["z2_gauss"], h2, k2, cdt, sample)

        # ---- z1 encoder (x projected in-kernel; the z2-conditioned gate
        # block rides the xgc operand — no concat, no [T*B, 4H] staging)
        c1 = params["z1_lstm"]["cells"][0]
        xg_z = proj(z2, c1["w"][D : D + z2.shape[-1]]) + c1["b"]  # [B, 4H]
        _, h1 = lstm2_pallas_tm_proj(params["z1_lstm"], xt, xg_z, T=T,
                                     interpret=interp, mm_dtype=mm)
        z1_mu, z1_logvar, z1 = layers.gauss_head(
            params["z1_gauss"], h1, k1, cdt, sample)

        # ---- decoder (constant per-step input: one [B, 4H] gate block)
        c1 = params["dec_lstm"]["cells"][0]
        z = jnp.concatenate([z1, z2], axis=-1)
        xg_c = proj(z, c1["w"][: z.shape[-1]]) + c1["b"]  # [B, 4H]
        tops_tm, _ = lstm2_pallas_tm(params["dec_lstm"], xg_c, T=T,
                                     interpret=interp, mm_dtype=mm)
        x_mu_f, x_logvar_f, _ = layers.gauss_head(
            params["dec_gauss"], tops_tm.reshape(T * B, -1), k_dec, cdt,
            sample=False)
        x_mu_tm = x_mu_f.reshape(T, B, self.feat_dim)
        x_logvar_tm = x_logvar_f.reshape(T, B, self.feat_dim)

        mu2_table, num_real, mesh, up = resolve_mu2_scoring(
            self, params, mu2_table)
        mu2 = mu2_table[seq_idx]
        lower_bound, log_px_z, neg_kld_z1, neg_kld_z2, log_pmu2 = assemble_elbo(
            xt, mu2, z1_mu, z1_logvar, z2_mu, z2_logvar,
            x_mu_tm, x_logvar_tm, nsegs,
            pz2_logvar=self.pz2_logvar, frame_axes=(0, 2),
        )
        log_qy = discriminative_log_qy(
            z2_mu, mu2_table, seq_idx, self.pz2_logvar, up,
            num_real=num_real, mesh=mesh,
        )
        return FHVAEOutputs(
            lower_bound=lower_bound,
            log_qy=log_qy,
            log_px_z=log_px_z,
            neg_kld_z1=neg_kld_z1,
            neg_kld_z2=neg_kld_z2,
            log_pmu2=log_pmu2,
            z1_mu=z1_mu,
            z2_mu=z2_mu,
            x_mu=jnp.swapaxes(x_mu_tm, 0, 1),
            x_logvar=jnp.swapaxes(x_logvar_tm, 0, 1),
        )

    def apply(
        self,
        params: dict,
        x: jnp.ndarray,
        seq_idx: jnp.ndarray,
        nsegs: jnp.ndarray,
        key: jax.Array,
        sample: bool = True,
        mu2_table: jnp.ndarray | None = None,
    ) -> FHVAEOutputs:
        x = x.astype(jnp.float32)
        if self._fused_ready(params, x.shape[0], x.shape[1]):
            return self._apply_fused(params, x, seq_idx, nsegs, key, sample,
                                     mu2_table)
        k_enc, k_dec = jax.random.split(key)
        enc = self.encode(params, x, k_enc, sample)
        x_mu, x_logvar, _ = self.decode(
            params, enc["z1"], enc["z2"], k_dec, sample=False, num_frames=x.shape[1]
        )

        # mu2_table override: evaluation supplies MAP-estimated tables for
        # held-out splits (models/base.py:resolve_mu2_scoring)
        mu2_table, num_real, mesh, up = resolve_mu2_scoring(
            self, params, mu2_table)
        mu2 = mu2_table[seq_idx]
        lower_bound, log_px_z, neg_kld_z1, neg_kld_z2, log_pmu2 = assemble_elbo(
            x, mu2,
            enc["z1_mu"], enc["z1_logvar"], enc["z2_mu"], enc["z2_logvar"],
            x_mu, x_logvar, nsegs,
            pz2_logvar=self.pz2_logvar,
        )
        log_qy = discriminative_log_qy(
            enc["z2_mu"], mu2_table, seq_idx, self.pz2_logvar, up,
            num_real=num_real, mesh=mesh,
        )
        return FHVAEOutputs(
            lower_bound=lower_bound,
            log_qy=log_qy,
            log_px_z=log_px_z,
            neg_kld_z1=neg_kld_z1,
            neg_kld_z2=neg_kld_z2,
            log_pmu2=log_pmu2,
            z1_mu=enc["z1_mu"],
            z2_mu=enc["z2_mu"],
            x_mu=x_mu,
            x_logvar=x_logvar,
        )

    def model_params(self) -> tuple:
        return (self.input_size, list(self.z1_hus), list(self.z2_hus),
                self.z1_dim, self.z2_dim, list(self.x_hus))
