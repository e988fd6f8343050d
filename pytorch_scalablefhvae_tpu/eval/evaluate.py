"""Experiment evaluation: the full implementation of what the reference's
``eval_model.py`` left as TODO (eval_model.py:57-59).

Given a trained experiment directory:

1. load the run config (JSON) and the best / Nth-epoch checkpoint
   (eval_model.py:41-55 parity);
2. build the requested split's dataset, optionally filtered to a sequence
   list (``--seqlist``, eval_model.py:20);
3. compute the variational lower bound and every ELBO term over the split;
4. extract per-segment z1/z2 latents, per-sequence mu2 MAP estimates, and
   per-sequence mean z1;
5. dump example reconstructions (input vs decoder mean);
6. write everything under ``<exp_dir>/eval/<split>/`` as ``.npz`` + JSON.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

from pytorch_scalablefhvae_tpu.config import ExperimentConfig
from pytorch_scalablefhvae_tpu.data.feature_store import FeatureStore
from pytorch_scalablefhvae_tpu.data.loader import SegmentLoader
from pytorch_scalablefhvae_tpu.data.segments import SegmentDataset
from pytorch_scalablefhvae_tpu.eval.latents import (
    estimate_mu2,
    extract_latents,
    sequence_mean_z1,
)
from pytorch_scalablefhvae_tpu.features.pipeline import split_manifests
from pytorch_scalablefhvae_tpu.models.base import build_model
from pytorch_scalablefhvae_tpu.train import checkpoint as ckpt
from pytorch_scalablefhvae_tpu.train.loop import evaluate_split
from pytorch_scalablefhvae_tpu.train.step import (
    create_train_state,
    make_eval_step,
    make_latent_step,
    make_optimizer,
)


def load_experiment(exp_dir: str | Path, step: int = -1, num_seqs: int | None = None):
    """Load config + model + params from an experiment directory.

    Returns (config, model, params, meta). ``num_seqs`` overrides the mu2
    table size when evaluating on a different split (table rows beyond the
    training set are meaningless for eval; the stored table is used when
    shapes match, else re-initialized)."""
    exp_dir = Path(exp_dir)
    config = ExperimentConfig.load(exp_dir / "config.json")
    ckpt_file = (
        ckpt.find_best_checkpoint(exp_dir) if step == -1
        else ckpt.find_epoch_checkpoint(exp_dir, step)
    )
    meta = ckpt.read_checkpoint_meta(ckpt_file)
    input_size = meta["model_params"][0]
    trained_num_seqs = meta.get("num_seqs", num_seqs or 1)
    feat_dim = meta.get("feat_dim", config.features.n_mels)
    model = build_model(
        config.model.model_type, input_size, config.model, trained_num_seqs,
        feat_dim=feat_dim,
    )
    optimizer = make_optimizer(
        config.optim.learning_rate, config.optim.beta_one, config.optim.beta_two
    )
    template = create_train_state(model, optimizer, seed=config.train.seed)
    state, meta = ckpt.load_any_checkpoint(ckpt_file, template, finetune=False)
    return config, model, state.params, meta


def evaluate_experiment(
    exp_dir: str | Path,
    set_name: str = "dev",
    seqlist: str | Path | None = None,
    step: int = -1,
    data_root: str | Path = ".",
    output_dir: str | Path | None = None,
    num_reconstructions: int = 8,
    verbose: bool = True,
) -> dict:
    exp_dir = Path(exp_dir)
    config, model, params, meta = load_experiment(exp_dir, step=step)

    paths = split_manifests(config, root=data_root)[set_name]
    sequence_list = None
    if seqlist is not None:
        sequence_list = [l.strip() for l in Path(seqlist).read_text().splitlines() if l.strip()]

    min_len = config.data.min_len if config.data.min_len is not None else config.data.seg_len
    if config.data.mvn_path and not Path(config.data.mvn_path).exists():
        # FeatureStore would silently RECOMPUTE the stats from this eval
        # split (different from the training stats -> skewed metrics and
        # latents) and write the bogus file; refuse like eval/encode.py
        raise FileNotFoundError(
            f"The run was trained with MVN ({config.data.mvn_path}) but the "
            f"stats file is missing; copy it next to the experiment or "
            f"point config.data.mvn_path at it"
        )
    store = FeatureStore(
        paths["feat_pth"], paths["len_pth"], min_len=min_len,
        mvn_path=config.data.mvn_path, sequence_list=sequence_list,
    )
    ds = SegmentDataset(store, seg_len=config.data.seg_len, seg_shift=config.data.seg_shift)
    loader = SegmentLoader(ds, config.data.dev_batch_size, shuffle=False, seed=0)

    # split-level metrics against a MAP-estimated mu2 table for this split
    # (held-out sequences have no rows in the learned table; the papers'
    # test-time procedure is MAP inference of mu2 from encoder means)
    from pytorch_scalablefhvae_tpu.train.loop import estimate_split_mu2
    from pytorch_scalablefhvae_tpu.train.step import make_encode_step

    encode_step = make_encode_step(model)
    split_table = jax.device_put(estimate_split_mu2(
        encode_step, params, loader, store.num_seqs,
        pz2_var=config.model.pz2_std**2, z2_dim=config.model.z2_dim,
    ))
    eval_step = make_eval_step(model, config.optim.alpha_dis, with_table_override=True)
    metrics = evaluate_split(eval_step, params, loader, jax.random.PRNGKey(0),
                             table=split_table)
    if verbose:
        print(f"==== {set_name} metrics ====")
        for k, v in metrics.items():
            print(f"  {k}: {v:.4f}")

    # latents + mu2 estimates; per-segment lower_bound scored against the
    # SPLIT's MAP table, same as the metrics above (the learned table has
    # no rows for held-out sequences)
    lat = extract_latents(model, params, loader, table=split_table)
    mu2_hat = estimate_mu2(
        lat["z2_mu"], lat["seq_idx"], store.num_seqs,
        pz2_var=config.model.pz2_std**2, pmu2_var=1.0,
    )
    z1_seq = sequence_mean_z1(lat["z1_mu"], lat["seq_idx"], store.num_seqs)

    # reconstructions + factor swap on the first batch: decoding
    # (z1 of a, z2 of b) keeps a's content with b's sequence identity —
    # the papers' qualitative disentanglement demo (arXiv 1709.07902 §5.2)
    recon = None
    lat_step = make_latent_step(model, with_table_override=True)
    for b in loader:
        out = lat_step(params, b.feats, b.seq_idx, b.nsegs,
                       jax.random.PRNGKey(1), split_table)
        n = min(num_reconstructions, int(b.weight.sum()))
        z1 = np.asarray(out["z1_mu"])[:n]
        z2 = np.asarray(out["z2_mu"])[:n]
        perm = np.roll(np.arange(n), 1)  # pair each segment with the next
        swap_mu, _, _ = model.decode(
            params, jax.numpy.asarray(z1), jax.numpy.asarray(z2[perm]),
            out_shape=tuple(b.feats.shape[1:]), num_frames=b.feats.shape[1],
        )
        recon = {
            "input": np.asarray(b.feats[:n]),
            "recon_mu": np.asarray(out["x_mu"])[:n],
            "swap_recon_mu": np.asarray(swap_mu),
            "swap_z2_from": np.asarray(b.seq_idx[:n])[perm],
            "seq_idx": np.asarray(b.seq_idx[:n]),
        }
        break

    # disentanglement probes: z2 should predict the speaker, z1 should not
    from pytorch_scalablefhvae_tpu.eval.probes import speaker_probes

    probes = speaker_probes(lat, store.seq_keys) if len(lat["seq_idx"]) else {}

    out_dir = Path(output_dir) if output_dir else exp_dir / "eval" / set_name
    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez(
        out_dir / "latents.npz",
        z1_mu=lat["z1_mu"], z2_mu=lat["z2_mu"], seq_idx=lat["seq_idx"],
        lower_bound=lat["lower_bound"], mu2_map=mu2_hat, z1_seq_mean=z1_seq,
    )
    if recon is not None:
        np.savez(out_dir / "reconstructions.npz", **recon)
    from pytorch_scalablefhvae_tpu.eval.probes import json_safe

    (out_dir / "metrics.json").write_text(
        json.dumps(
            # json_safe: an empty probe split reports NaN accuracies, which
            # json.dumps would emit as the non-standard NaN token
            json_safe({"set_name": set_name,
                       **{k: float(v) for k, v in metrics.items()},
                       "probes": probes}),
            indent=2,
        )
    )
    (out_dir / "sequences.json").write_text(json.dumps(store.seq_keys))
    if verbose:
        if probes:
            z1p = probes["z1_speaker_probe"]
            z2p = probes["z2_speaker_probe"]
            print(f"Speaker probe ({probes['num_speakers']} speakers, "
                  f"chance {z2p['chance']:.3f}): "
                  f"z2 acc {z2p['test_acc']:.3f}, z1 acc {z1p['test_acc']:.3f}")
        print(f"Wrote evaluation outputs to {out_dir}")
    return {"metrics": metrics, "latents": lat, "mu2_map": mu2_hat,
            "probes": probes, "output_dir": out_dir}
