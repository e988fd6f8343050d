"""``sfhvae`` command-line interface.

Single entry point with subcommands covering the reference's script surface
(SURVEY.md §9): ``preprocess`` (preprocess_data.py), ``train``
(train_model.py), ``eval`` (eval_model.py, fully implemented here), plus
corpus-level helpers ``prep-timit`` / ``prep-librispeech``.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path


def _honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS`` authoritative and enable the persistent
    compilation cache.

    Some environments programmatically select a platform at interpreter
    startup (overriding the env var); re-assert the user's choice here.
    Opt-in XLA compilation cache: set ``SFHVAE_XLA_CACHE=<dir>`` to make
    repeat runs skip the 20-40 s first-compile. (Opt-in because some
    experimental PJRT backends stall when the persistent cache is active.)
    """
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    cache_dir = os.environ.get("SFHVAE_XLA_CACHE")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


from pytorch_scalablefhvae_tpu.cli.args import (
    add_common_flags,
    add_train_flags,
    config_from_args,
)


def _cmd_preprocess(args) -> int:
    from pytorch_scalablefhvae_tpu.features.pipeline import preprocess_data

    config = config_from_args(args)
    paths = preprocess_data(config, root=args.data_root, fbank_conf=args.fbank_conf)
    for split, d in paths.items():
        print(split, {k: str(v) for k, v in d.items()})
    return 0


def _cmd_train(args) -> int:
    from pytorch_scalablefhvae_tpu.train.driver import train_from_config

    config = config_from_args(args)
    overrides = {}
    for item in args.resume_override or []:
        if "=" not in item:
            raise SystemExit(f"--resume-override expects FIELD=VALUE, got {item!r}")
        k, _, v = item.partition("=")
        overrides[k.strip()] = v.strip()
    result = train_from_config(
        config,
        data_root=args.data_root,
        exp_root=args.exp_root,
        is_preprocessed=args.is_preprocessed,
        continue_from=args.continue_from,
        finetune=args.finetune,
        fbank_conf=args.fbank_conf,
        resume_overrides=overrides or None,
    )
    return 2 if result.diverged else 0


def _cmd_eval(args) -> int:
    from pytorch_scalablefhvae_tpu.eval.evaluate import evaluate_experiment

    result = evaluate_experiment(
        exp_dir=args.exp_dir,
        set_name=args.set_name,
        seqlist=args.seqlist,
        step=args.step,
        data_root=args.data_root,
        output_dir=args.output_dir,
        num_reconstructions=args.num_reconstructions,
    )
    if args.tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter

            w = SummaryWriter(args.tb_log_dir)
            for k, v in result["metrics"].items():
                w.add_scalar(f"eval/{args.set_name}/{k}", float(v), 0)
            w.close()
        except Exception as e:
            print(f"TensorBoard unavailable ({e})")
    return 0


def _cmd_extract(args) -> int:
    from pytorch_scalablefhvae_tpu.features.extract import (
        prepare_jax,
        prepare_kaldi,
        prepare_numpy,
    )

    sets = [args.set_name] if args.set_name else ["train", "dev", "test"]
    for s in sets:
        if args.data_format == "kaldi":
            prepare_kaldi(args.dataset_dir, s, args.fbank_conf,
                          sample_rate=args.sample_rate)
        elif args.extractor == "jax":
            prepare_jax(args.dataset, s, args.dataset_dir, ftype=args.feat_type,
                        sample_rate=args.sample_rate, win_t=args.win_size,
                        hop_t=args.hop_size, n_mels=args.mels)
        else:
            prepare_numpy(args.dataset, s, args.dataset_dir, ftype=args.feat_type,
                          sample_rate=args.sample_rate, win_t=args.win_size,
                          hop_t=args.hop_size, n_mels=args.mels)
    return 0


def _cmd_probe(args) -> int:
    import json
    from pathlib import Path

    import numpy as np

    from pytorch_scalablefhvae_tpu.eval.probes import json_safe, speaker_probes

    lat_dir = Path(args.exp_dir) / "eval" / args.set_name
    if not (lat_dir / "latents.npz").exists():
        from pytorch_scalablefhvae_tpu.eval.evaluate import evaluate_experiment

        evaluate_experiment(args.exp_dir, set_name=args.set_name,
                            data_root=args.data_root, verbose=False)
    with np.load(lat_dir / "latents.npz") as z:
        lat = {k: z[k] for k in ("z1_mu", "z2_mu", "seq_idx")}
    seq_keys = json.loads((lat_dir / "sequences.json").read_text())
    res = speaker_probes(lat, seq_keys, seed=args.seed)
    print(json.dumps(json_safe(res), indent=2))
    return 0


def _cmd_encode(args) -> int:
    from pytorch_scalablefhvae_tpu.eval.encode import encode_audio

    encode_audio(
        args.exp_dir,
        args.audio,
        step=args.step,
        output_dir=args.output_dir,
        batch_size=args.batch_size,
        sample_rate=args.sample_rate,
    )
    return 0


def _cmd_serve(args) -> int:
    from pytorch_scalablefhvae_tpu.eval.serve import serve

    return serve(args.exp_dir, step=args.step, batch_size=args.batch_size)


def _cmd_import_checkpoint(args) -> int:
    from pytorch_scalablefhvae_tpu.compat import import_reference_checkpoint

    path = import_reference_checkpoint(
        args.checkpoint, args.out_dir, args.num_seqs,
        mu2_init_std=args.mu2_init_std,
    )
    print(f"Wrote {path}")
    return 0


def _cmd_prep_timit(args) -> int:
    from pytorch_scalablefhvae_tpu.corpus.timit import process_timit

    process_timit(args.raw_data_dir, args.output_dir, args.dev_spk, args.test_spk)
    return 0


def _cmd_prep_librispeech(args) -> int:
    from pytorch_scalablefhvae_tpu.corpus.librispeech import process_librispeech

    process_librispeech(
        args.raw_data_dir, args.output_dir, args.data_format,
        args.train_list, args.dev_list, args.test_list,
    )
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="sfhvae",
        description="TPU-native ScalableFHVAE framework",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument(
        "--compile-cache", type=str, default=None, metavar="DIR",
        help="Persistent XLA compilation cache directory (also via "
             "SFHVAE_COMPILE_CACHE): process restarts — a resumed training "
             "run, a redeployed `serve` — reuse compiled programs instead "
             "of paying cold compiles. Place BEFORE the subcommand.")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("preprocess", help="Prepare corpus + extract features",
                       formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_flags(p)
    p.add_argument("--data-root", type=str, default=".", help="Output root for datasets")
    p.set_defaults(fn=_cmd_preprocess)

    p = sub.add_parser("train", help="Train a model",
                       formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_flags(p)
    add_train_flags(p)
    p.set_defaults(fn=_cmd_train)

    p = sub.add_parser("eval", help="Evaluate a trained experiment",
                       formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("exp_dir", type=str, help="Experiment directory")
    p.add_argument("--set-name", type=str, default="dev",
                   choices=["train", "dev", "test"], help="Dataset partition to evaluate")
    p.add_argument("--seqlist", type=str, default=None,
                   help="File listing a subset of sequences to evaluate")
    p.add_argument("--step", type=int, default=-1,
                   help="Epoch checkpoint to load; -1 loads the best checkpoint")
    p.add_argument("--data-root", type=str, default=".",
                   help="Root directory holding preprocessed datasets")
    p.add_argument("--output-dir", type=str, default=None,
                   help="Where to write latents/reconstructions (default: exp_dir/eval)")
    p.add_argument("--num-reconstructions", type=int, default=8,
                   help="Number of example segment reconstructions to dump")
    p.add_argument("--tensorboard", action="store_true",
                   help="Also write eval metrics as TensorBoard scalars")
    p.add_argument("--visdom", action="store_true",
                   help="Accepted for reference-CLI parity; metrics go to JSON/TensorBoard")
    p.add_argument("--tb-log-dir", default="./visualize/tensorboard",
                   help="Location of tensorboard log")
    p.set_defaults(fn=_cmd_eval)

    p = sub.add_parser("probe", help="Speaker-probe disentanglement diagnostic "
                       "over extracted latents",
                       formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("exp_dir", type=str, help="Experiment directory")
    p.add_argument("--set-name", type=str, default="dev",
                   choices=["train", "dev", "test"])
    p.add_argument("--data-root", type=str, default=".")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=_cmd_probe)

    p = sub.add_parser(
        "extract",
        help="Feature extraction for existing wav.scp manifests "
             "(prepare_numpy_data.py / prepare_kaldi_data.py parity)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("dataset_dir", type=str,
                   help="Directory containing <set>/wav.scp manifests")
    p.add_argument("--set-name", "--set_name", dest="set_name", type=str, default=None,
                   help="Set {train, dev, test} to operate on; all three if omitted")
    add_common_flags(p)
    p.set_defaults(fn=_cmd_extract)

    p = sub.add_parser(
        "encode",
        help="Encode raw audio with a trained experiment: decode -> features "
             "(run's exact config + MVN) -> segment -> z1/z2 latents + "
             "per-utterance mu2 MAP, written as npz",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("exp_dir", type=str, help="Experiment directory")
    p.add_argument("audio", type=str, nargs="+",
                   help="Audio files, directories, or wav.scp manifests")
    p.add_argument("--output-dir", type=str, default="./encoded",
                   help="Where to write latents.npz + sequences.json")
    p.add_argument("--step", type=int, default=-1,
                   help="Epoch checkpoint to load; -1 loads the best checkpoint")
    p.add_argument("--batch-size", type=int, default=2048,
                   help="Segment batch size for the encoder passes")
    p.add_argument("--sample-rate", type=int, default=None,
                   help="Resample all inputs to this rate. Must match the "
                        "run's configured rate when one is set; when the run "
                        "used native rates, pass the rate the training audio "
                        "actually had — encoding at a different rate skews "
                        "the feature geometry")
    p.set_defaults(fn=_cmd_encode)

    p = sub.add_parser(
        "serve",
        help="Persistent encode server: load the experiment once, then "
             "answer JSONL encode requests on stdin (one JSON object per "
             "line; see eval/serve.py for the protocol). Compiled encoder "
             "programs stay warm across requests",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("exp_dir", type=str, help="Experiment directory")
    p.add_argument("--step", type=int, default=-1,
                   help="Epoch checkpoint to load; -1 loads the best checkpoint")
    p.add_argument("--batch-size", type=int, default=2048,
                   help="Segment batch size for the encoder passes")
    p.set_defaults(fn=_cmd_serve)

    p = sub.add_parser(
        "import-checkpoint",
        help="Convert a reference PyTorch .tar checkpoint (utils.py:116-152 "
             "schema) to this framework's npz format for --continue-from "
             "--finetune (the reference never persisted a mu2 table, so the "
             "imported table is fresh and resume is finetune-like)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("checkpoint", type=str, help="Reference .tar checkpoint")
    p.add_argument("out_dir", type=str, help="Output directory for the npz")
    p.add_argument("--num-seqs", type=int, required=True,
                   help="mu2 table rows (training-corpus sequence count)")
    p.add_argument("--mu2-init-std", type=float, default=0.0,
                   help="stddev of the fresh mu2 table (0 = zeros)")
    p.set_defaults(fn=_cmd_import_checkpoint)

    p = sub.add_parser("prep-timit", help="Generate TIMIT wav.scp manifests",
                       formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("raw_data_dir", type=str, help="TIMIT raw data directory")
    p.add_argument("output_dir", type=str, help="Directory for data output")
    p.add_argument("--dev_spk", type=str, default="./misc/timit_dev_spk.list")
    p.add_argument("--test_spk", type=str, default="./misc/timit_test_spk.list")
    p.set_defaults(fn=_cmd_prep_timit)

    p = sub.add_parser("prep-librispeech", help="Generate LibriSpeech wav.scp manifests",
                       formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("raw_data_dir", type=str, help="LibriSpeech raw data directory")
    p.add_argument("output_dir", type=str, help="Directory for data output")
    p.add_argument("--data-format", type=str, default="numpy", choices=["numpy", "kaldi"])
    p.add_argument("--train_list", type=str, nargs="*", default=["train-clean-100"])
    p.add_argument("--dev_list", type=str, nargs="*", default=["dev-clean", "dev-other"])
    p.add_argument("--test_list", type=str, nargs="*", default=["test-clean", "test-other"])
    p.set_defaults(fn=_cmd_prep_librispeech)

    return parser


def _maybe_init_multihost(args) -> bool:
    """Initialize the multi-host runtime when requested (--multihost flag or
    SFHVAE_MULTIHOST env). Returns whether initialization ran.

    On a pod, ``jax.distributed.initialize()`` discovers the coordinator from
    TPU metadata/env and makes ``jax.devices()`` span every host; the mesh
    layout rules for DCN vs ICI axes are documented in SCALING.md and
    enforced by ``parallel.mesh.validate_multihost_mesh``.
    """
    if not (getattr(args, "multihost", False) or os.environ.get("SFHVAE_MULTIHOST")):
        return False
    import jax

    # explicit coordinator overrides for launchers jax's cluster
    # auto-detection doesn't recognize (plain SSH/process launchers; also
    # how tests/test_multihost.py runs a REAL 2-process init). On pods,
    # leave these unset and initialize() discovers everything itself.
    kwargs = {}
    if os.environ.get("SFHVAE_COORDINATOR"):
        missing = [v for v in ("SFHVAE_NUM_PROCESSES", "SFHVAE_PROCESS_ID")
                   if not os.environ.get(v)]
        if missing:
            raise SystemExit(
                f"SFHVAE_COORDINATOR is set but {' and '.join(missing)} "
                f"{'is' if len(missing) == 1 else 'are'} not: the manual-"
                f"coordinator mode needs all three of SFHVAE_COORDINATOR, "
                f"SFHVAE_NUM_PROCESSES, and SFHVAE_PROCESS_ID (on TPU pods, "
                f"unset SFHVAE_COORDINATOR and let jax.distributed."
                f"initialize() auto-discover instead)."
            )
        kwargs = {
            "coordinator_address": os.environ["SFHVAE_COORDINATOR"],
            "num_processes": int(os.environ["SFHVAE_NUM_PROCESSES"]),
            "process_id": int(os.environ["SFHVAE_PROCESS_ID"]),
        }
    jax.distributed.initialize(**kwargs)
    if getattr(args, "mesh", None):
        from pytorch_scalablefhvae_tpu.parallel.mesh import validate_multihost_mesh

        shape = tuple(int(x) for x in args.mesh.split(","))
        validate_multihost_mesh((shape + (1, 1))[:2])
    return True


def main(argv=None) -> int:
    _honor_platform_env()
    args = build_parser().parse_args(argv)
    cache_dir = args.compile_cache or os.environ.get("SFHVAE_COMPILE_CACHE")
    if cache_dir:
        import jax

        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        # cache every program (the default skips sub-second compiles; a
        # serve/train restart wants ALL of them warm)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    _maybe_init_multihost(args)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
