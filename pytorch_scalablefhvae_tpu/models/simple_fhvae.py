"""SimpleFHVAE: MLP encoder/decoder factorized hierarchical VAE.

Architecture parity with the reference (simple_fhvae.py:8-124):

- z2 path:  flatten(x) -> MLP(z2_hus) -> Gaussian head (z2_dim)
- z1 path:  [flatten(x), z2] -> MLP(z1_hus) -> Gaussian head (z1_dim)
- decoder:  [z1, z2] -> MLP(x_hus) -> Gaussian head (input_size) -> reshape
- per-sequence mu2 table (persistent + learnable here; see base.py for the
  defect-fix rationale) with the discriminative segment objective.

Pure functions over a params pytree; sampling takes explicit PRNG keys.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pytorch_scalablefhvae_tpu.models import layers
from pytorch_scalablefhvae_tpu.models.base import (
    FHVAEOutputs,
    assemble_elbo,
    discriminative_log_qy,
    init_mu2_table,
    resolve_mu2_scoring,
)
import numpy as np


@dataclass(frozen=True)
class SimpleFHVAE:
    """Model definition (static hyperparameters; params live in a pytree)."""

    input_size: int
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
    # mu2 rows padded up to a multiple of the mesh's model axis (None: no
    # padding). Padded rows are masked out of the discriminative softmax and
    # never gathered — pure layout, not architecture.
    num_seqs_padded: int | None = None
    # mesh for the shard_map'd Pallas discriminative path (None: GSPMD/jnp)
    shard_mesh: object = None

    model_type = "simple_fhvae"

    @property
    def table_rows(self) -> int:
        return self.num_seqs_padded or self.num_seqs

    @classmethod
    def from_config(cls, input_size: int, cfg, num_seqs: int) -> "SimpleFHVAE":
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
        )

    @property
    def pz2_logvar(self) -> float:
        return float(np.log(self.pz2_std**2))

    @property
    def _cdt(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    def init(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 7)
        return {
            "z2_pre": layers.init_mlp(ks[0], self.input_size, self.z2_hus),
            "z2_gauss": layers.init_gauss_head(ks[1], self.z2_hus[-1], self.z2_dim),
            "z1_pre": layers.init_mlp(ks[2], self.input_size + self.z2_dim, self.z1_hus),
            "z1_gauss": layers.init_gauss_head(ks[3], self.z1_hus[-1], self.z1_dim),
            "dec_pre": layers.init_mlp(ks[4], self.z1_dim + self.z2_dim, self.x_hus),
            "dec_gauss": layers.init_gauss_head(ks[5], self.x_hus[-1], self.input_size),
            "mu2_table": init_mu2_table(ks[6], self.table_rows, self.z2_dim, self.mu2_init_std),
        }

    def encode(
        self, params: dict, x: jnp.ndarray, key: jax.Array, sample: bool = True
    ) -> dict:
        """Encoder pass; returns z1/z2 posteriors and samples."""
        B = x.shape[0]
        flat = x.reshape(B, -1)
        cdt = self._cdt
        k2, k1 = jax.random.split(key)

        z2_pre = layers.mlp(params["z2_pre"], flat, cdt)
        z2_mu, z2_logvar, z2 = layers.gauss_head(params["z2_gauss"], z2_pre, k2, cdt, sample)

        z1_in = jnp.concatenate([flat, z2], axis=-1)
        z1_pre = layers.mlp(params["z1_pre"], z1_in, cdt)
        z1_mu, z1_logvar, z1 = layers.gauss_head(params["z1_gauss"], z1_pre, k1, cdt, sample)
        return {
            "z1_mu": z1_mu, "z1_logvar": z1_logvar, "z1": z1,
            "z2_mu": z2_mu, "z2_logvar": z2_logvar, "z2": z2,
        }

    def encode_z2(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """Posterior MEAN of the sequence latent only: ``[B, z2_dim]``.

        The MAP mu2 passes (device_step.make_device_map_pass,
        loop.estimate_split_mu2) need only ``z2_mu``; skipping the z1
        encoder, the decoder, and the logvar/sampling heads cuts the pass
        to the z2 trunk alone. Identical numerics to
        ``encode(...)[\"z2_mu\"]``.
        """
        flat = x.reshape(x.shape[0], -1)
        z2_pre = layers.mlp(params["z2_pre"], flat, self._cdt)
        return layers.dense(params["z2_gauss"]["mu"], z2_pre, self._cdt)

    def decode(
        self,
        params: dict,
        z1: jnp.ndarray,
        z2: jnp.ndarray,
        key: jax.Array | None = None,
        sample: bool = False,
        out_shape: tuple[int, int] | None = None,
        num_frames: int | None = None,  # accepted for FHVAE interface parity
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Decoder pass -> (x_mu, x_logvar, x_sample), reshaped to [B, T, F]."""
        cdt = self._cdt
        dec_in = jnp.concatenate([z1, z2], axis=-1)
        dec_pre = layers.mlp(params["dec_pre"], dec_in, cdt)
        if key is None:
            key = jax.random.PRNGKey(0)
        x_mu, x_logvar, x_sample = layers.gauss_head(
            params["dec_gauss"], dec_pre, key, cdt, sample
        )
        if out_shape is not None:
            B = z1.shape[0]
            x_mu = x_mu.reshape(B, *out_shape)
            x_logvar = x_logvar.reshape(B, *out_shape)
            x_sample = x_sample.reshape(B, *out_shape)
        return x_mu, x_logvar, x_sample

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
        """Full forward pass; reference ``SimpleFHVAE.forward`` parity
        (simple_fhvae.py:71-124).

        Args:
            x: [B, T, F] segment features
            seq_idx: [B] int32 owning-sequence index (mu2 table row)
            nsegs: [B] float segment count of the owning sequence
            key: PRNG key for reparameterized sampling
            sample: if False, use posterior means (eval determinism)
        """
        x = x.astype(jnp.float32)
        k_enc, k_dec = jax.random.split(key)
        enc = self.encode(params, x, k_enc, sample)

        x_mu, x_logvar, _ = self.decode(
            params, enc["z1"], enc["z2"], k_dec, sample=False, out_shape=x.shape[1:]
        )

        # mu2_table override: evaluation supplies MAP-estimated tables for
        # held-out splits (the learned table only covers training sequences);
        # override tables are unpadded and unsharded
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

    # checkpoint schema parity (utils.py:135-141): constructor params tuple
    def model_params(self) -> tuple:
        return (self.input_size, list(self.z1_hus), list(self.z2_hus),
                self.z1_dim, self.z2_dim, list(self.x_hus))
