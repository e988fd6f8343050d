"""High-level training driver: config -> data -> training loop.

The glue the reference performed at module scope (train_model.py:264-436):
device selection (implicit in JAX), preprocessing when needed, dataset and
loader construction, experiment-directory setup, resume handling (loading the
saved run config — explicitly, from JSON, rather than silently overwriting
live flags; B14), and hierarchical sampling (B10 fixed).
"""

from __future__ import annotations

from pathlib import Path

from pytorch_scalablefhvae_tpu.config import ExperimentConfig
from pytorch_scalablefhvae_tpu.data.feature_store import FeatureStore
from pytorch_scalablefhvae_tpu.data.loader import SegmentLoader
from pytorch_scalablefhvae_tpu.data.segments import SegmentDataset
from pytorch_scalablefhvae_tpu.features.pipeline import preprocess_data, split_manifests
from pytorch_scalablefhvae_tpu.train.loop import TrainResult, run_training


def build_loaders(
    config: ExperimentConfig,
    data_root: str | Path = ".",
    is_preprocessed: bool = True,
    fbank_conf: str | Path = "./misc/fbank.conf",
    sequence_list=None,
) -> tuple[SegmentLoader, SegmentLoader]:
    dcfg = config.data
    min_len = dcfg.min_len if dcfg.min_len is not None else dcfg.seg_len

    if not is_preprocessed:
        if dcfg.raw_data_dir is None and dcfg.dataset != "synthetic":
            raise ValueError(
                "You must provide a raw data location if the data is not preprocessed!"
            )
        paths = preprocess_data(config, root=data_root, fbank_conf=fbank_conf)
    else:
        paths = split_manifests(config, root=data_root)

    def make_loader(split: str, batch_size: int, shuffle: bool, seqs=None) -> SegmentLoader:
        pack_cache = None
        if dcfg.pack_cache_dir is not None:
            pack_cache = Path(dcfg.pack_cache_dir) / f"{split}_pack"
        store = FeatureStore(
            paths[split]["feat_pth"],
            paths[split]["len_pth"],
            min_len=min_len,
            mvn_path=dcfg.mvn_path,
            sequence_list=seqs,
            pack_cache=pack_cache,
        )
        ds = SegmentDataset(
            store,
            seg_len=dcfg.seg_len,
            seg_shift=dcfg.seg_shift,
            rand_seg=dcfg.rand_seg,
            seed=config.train.seed,
        )
        return SegmentLoader(ds, batch_size, shuffle=shuffle, seed=config.train.seed,
                             transfer_dtype=dcfg.transfer_dtype)

    # under hierarchical sampling the loop subsets the full store per epoch
    # (train/loop.py); the loader built here always covers the full split
    train_bs, dev_bs = dcfg.training_batch_size, dcfg.dev_batch_size
    if config.train.legacy:
        # legacy mode forces batch-size-1 loaders alongside step-based epochs
        # (reference train_model.py:379-385)
        train_bs = dev_bs = 1
    train_loader = make_loader("train", train_bs, True, sequence_list)
    dev_loader = make_loader("dev", dev_bs, False)
    return train_loader, dev_loader


def train_from_config(
    config: ExperimentConfig,
    data_root: str | Path = ".",
    exp_root: str | Path = "./experiments",
    is_preprocessed: bool = False,
    continue_from: str | Path | None = None,
    finetune: bool = False,
    fbank_conf: str | Path = "./misc/fbank.conf",
    verbose: bool = True,
    resume_overrides: dict | None = None,
) -> TrainResult:
    if continue_from is not None:
        # resume: the run's persisted JSON config defines the experiment
        # (explicit policy replacing the reference's silent pickle overwrite);
        # deliberate changes (e.g. extending epochs) go through
        # resume_overrides / the --resume-override flag
        saved = Path(continue_from).parent / "config.json"
        if saved.exists():
            resumed = ExperimentConfig.load(saved)
            if verbose and resumed != config:
                print(f"Using saved run config from {saved}")
            config = resumed
        if resume_overrides:
            config = config.apply_overrides(resume_overrides)
            if verbose:
                print(f"Resume overrides applied: {resume_overrides}")
    elif resume_overrides:
        raise ValueError(
            "--resume-override only applies when resuming (--continue-from); "
            "set the flag directly for a fresh run"
        )

    if (config.features.data_format == "kaldi"
            and config.features.fbank_conf_kwargs is None
            and Path(fbank_conf).exists()):
        # persist the PARSED conf into the run's saved config: encode/serve
        # rebuild features from the config alone (the conf file may not
        # exist where they run), and FeatureConfig defaults must never
        # silently replace a custom conf's settings (eval/encode.py)
        import dataclasses as _dc

        from pytorch_scalablefhvae_tpu.features.kaldi_fbank import (
            fbank_kwargs_from_conf,
            parse_fbank_conf,
        )

        config = config.replace(features=_dc.replace(
            config.features,
            fbank_conf_kwargs=fbank_kwargs_from_conf(
                parse_fbank_conf(str(fbank_conf)))))

    if continue_from is not None and not finetune:
        # a resume continues THE experiment: keep writing into the
        # checkpoint's directory even when an override changes a field that
        # the directory name embeds (epochs/patience). Finetune is a new
        # experiment and gets its own config-derived directory.
        exp_dir = Path(continue_from).parent
    else:
        exp_dir = config.exp_dir(exp_root)
        if finetune and continue_from is not None:
            # a finetune is a new experiment and must never write into a
            # directory that already holds checkpoints (the saved config
            # re-derives the source run's name — and a finetune-of-a-finetune
            # would re-derive the ORIGINAL run's name)
            base = exp_dir
            n = 0
            while exp_dir.exists() and (
                any(exp_dir.glob("*_e*.npz")) or any(exp_dir.glob("*_e*.orbax"))
            ):
                n += 1
                suffix = "_finetune" if n == 1 else f"_finetune{n}"
                exp_dir = base.with_name(base.name + suffix)
    train_loader, dev_loader = build_loaders(
        config, data_root, is_preprocessed, fbank_conf
    )
    return run_training(
        config,
        train_loader,
        dev_loader,
        exp_dir,
        continue_from=continue_from,
        finetune=finetune,
        verbose=verbose,
    )
