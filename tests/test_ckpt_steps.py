"""Step-cadence checkpointing + mid-epoch resume (--ckpt-every-steps /
--max-steps).

The contract: a run killed at an arbitrary optimizer step resumes from the
step-cadence checkpoint and produces the SAME trajectory as the
uninterrupted run — the sidecar's plan cursor (epoch, batches done) plus the
deterministic epoch schedule make the continuation exact. Covered on the
device-resident, streamed, and host (K-stack) data paths, both backends.
"""

import dataclasses

import jax
import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from pytorch_scalablefhvae_tpu.features.pipeline import preprocess_data
from pytorch_scalablefhvae_tpu.train import checkpoint as ckpt
from pytorch_scalablefhvae_tpu.train.driver import train_from_config


class TestMidEpochNaming:
    def test_epoch_of_ignores_cadence_suffix(self, tmp_path):
        from pathlib import Path

        from pytorch_scalablefhvae_tpu.train.checkpoint import _epoch_of

        assert _epoch_of(Path("m_run_e3.npz")) == 3
        assert _epoch_of(Path("m_run_e3s40.npz")) == -1
        assert _epoch_of(Path("m_run_e12s7.orbax")) == -1

    def test_cleanup_mid_epoch(self, tmp_path):
        for name in ("m_run_e0s3.npz", "m_run_e0s3.json", "m_run_e1s5.npz",
                     "m_run_e2s4.npz", "m_run_e1.npz", "other_run_e0s3.npz"):
            (tmp_path / name).write_text("x")
        (tmp_path / "m_run_e1s9.orbax").mkdir()
        ckpt.cleanup_mid_epoch(tmp_path, "m", "run", upto_epoch=1)
        left = sorted(p.name for p in tmp_path.iterdir())
        assert left == ["m_run_e1.npz", "m_run_e2s4.npz", "other_run_e0s3.npz"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    # large enough that an epoch spans MANY batches at B=32 (the kill at
    # --max-steps must land mid-epoch, not at an epoch boundary)
    root = tmp_path_factory.mktemp("corpus")
    cfg = ExperimentConfig(data=DataConfig(
        dataset="synthetic", synthetic_speakers=6, synthetic_utts=4))
    preprocess_data(cfg, root=root)
    return root


def make_cfg(tmp_path, tag, placement="auto", **kw):
    data_kw = dict(
        dataset="synthetic",
        mvn_path=str(tmp_path / f"mvn_{tag}.json"),
        training_batch_size=32,
        dev_batch_size=64,
        data_placement=placement,
    )
    for dk in ("stream_chunk_bytes", "epoch_plan"):
        if dk in kw:
            data_kw[dk] = kw.pop(dk)
    return ExperimentConfig(
        data=DataConfig(**data_kw),
        model=ModelConfig(z1_hus=(32, 32), z2_hus=(32, 32), x_hus=(32, 32),
                          z1_dim=8, z2_dim=8),
        train=TrainConfig(epochs=2, patience=10, seed=0, **kw),
    )


def run(cfg, corpus, tmp_path, tag, continue_from=None, overrides=None):
    res = train_from_config(
        cfg, data_root=corpus, exp_root=tmp_path / f"exp_{tag}",
        is_preprocessed=True, verbose=False, continue_from=continue_from,
        resume_overrides=overrides,
    )
    assert not res.diverged
    return res


def assert_params_close(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-5),
        a.state.params, b.state.params,
    )


def kill_resume_roundtrip(corpus, tmp_path, tag, placement, backend="npz",
                          max_steps=5, **kw):
    """Full A/B: uninterrupted vs (kill at max_steps -> resume) equivalence."""
    full = run(make_cfg(tmp_path, f"{tag}_full", placement,
                        ckpt_backend=backend, **kw),
               corpus, tmp_path, f"{tag}_full")
    killed_cfg = make_cfg(tmp_path, f"{tag}_kill", placement,
                          ckpt_backend=backend, ckpt_every_steps=3,
                          max_steps=max_steps, **kw)
    killed = run(killed_cfg, corpus, tmp_path, f"{tag}_kill")
    # the run stopped mid-epoch, leaving a cadence checkpoint at the cursor
    assert int(killed.state.step) >= max_steps
    exp = next((tmp_path / f"exp_{tag}_kill").glob("**/config.json")).parent
    suffix = ".orbax" if backend == "orbax" else ".npz"

    def cursor(p):
        e, s = p.name.rsplit("_e", 1)[1].split(".")[0].split("s")
        return (int(e), int(s))

    mids = sorted(exp.glob(f"*_e*s*{suffix}"), key=cursor)
    assert mids, f"no mid-epoch checkpoints under {exp}"
    resumed = run(killed_cfg, corpus, tmp_path, f"{tag}_kill",
                  continue_from=mids[-1], overrides={"max_steps": 0})
    assert_params_close(full, resumed)
    # metrics of BOTH epochs match the uninterrupted run — including the
    # resumed epoch's TRAIN loss: the cadence cursor persists the pre-kill
    # prefix's metric partials, so the recorded epoch average spans the
    # whole epoch, not just the post-resume remainder
    for series in ("train_loss_results", "val_loss_results",
                   "lower_bound_results"):
        np.testing.assert_allclose(
            list(resumed.history.values[series].values()),
            list(full.history.values[series].values()),
            rtol=1e-4, atol=1e-5,
        )
    return exp


@pytest.mark.slow
class TestKillResume:
    def test_device_path_npz(self, corpus, tmp_path):
        exp = kill_resume_roundtrip(corpus, tmp_path, "dev", "device")
        # the resumed run's epoch-end checkpoints supersede every cadence file
        assert not list(exp.glob("*_e*s*.npz"))

    def test_device_path_k_bundled_orbax(self, corpus, tmp_path):
        kill_resume_roundtrip(corpus, tmp_path, "devk", "device",
                              backend="orbax", steps_per_dispatch=3,
                              max_steps=5)

    def test_stream_path(self, corpus, tmp_path):
        kill_resume_roundtrip(corpus, tmp_path, "stream", "stream",
                              stream_chunk_bytes=64 << 10,
                              steps_per_dispatch=2, max_steps=5)

    def test_host_stack_path(self, corpus, tmp_path):
        kill_resume_roundtrip(corpus, tmp_path, "host", "host",
                              steps_per_dispatch=3, max_steps=5)

    def test_host_plain_path(self, corpus, tmp_path):
        kill_resume_roundtrip(corpus, tmp_path, "hostp", "host", max_steps=5)

    def test_hierarchical_path(self, corpus, tmp_path):
        """Hierarchical rounds are pure functions of (seed, epoch): the
        subset draw keys on the boundary epoch, and resuming into a live
        round keeps the restored table instead of re-MAP-initializing —
        so a mid-round kill resumes onto the identical trajectory."""
        kill_resume_roundtrip(corpus, tmp_path, "hier", "device",
                              sample_hierarchical=True,
                              num_hierarchical_sequences=6, max_steps=3)

    def test_hierarchical_device_epoch_plan(self, corpus, tmp_path):
        """hier + --epoch-plan device + mid-epoch resume: the round's
        planner metadata must stage on resume re-entry even though the MAP
        init is skipped (regression: dev_plan_meta stayed None and the
        first dispatch crashed)."""
        kill_resume_roundtrip(corpus, tmp_path, "hierplan", "device",
                              sample_hierarchical=True,
                              num_hierarchical_sequences=6,
                              epoch_plan="device", max_steps=3)

    def test_hierarchical_multi_epoch_rounds_orbax(self, corpus, tmp_path):
        """--hierarchical-round-epochs > 1 + orbax: the kill lands inside a
        round's SECOND epoch; the resume must rebuild the boundary epoch's
        subset (absolute boundaries) without re-initializing the table."""
        kill_resume_roundtrip(corpus, tmp_path, "hier2", "device",
                              backend="orbax", sample_hierarchical=True,
                              num_hierarchical_sequences=6,
                              hierarchical_round_epochs=2, max_steps=3)


class TestValidation:
    def test_rejected_with_legacy(self, corpus, tmp_path):
        with pytest.raises(ValueError, match="not supported"):
            run(make_cfg(tmp_path, "leg", "host", legacy=True,
                         ckpt_every_steps=2),
                corpus, tmp_path, "leg")

    def test_nan_state_never_checkpointed_at_boundary(self, corpus,
                                                      tmp_path):
        """A run that diverges inside its FINAL dispatch before the
        --max-steps boundary must exit 2 with NO mid-epoch checkpoint: the
        lag-one per-dispatch NaN check never fires when no later dispatch
        follows, so without the pre-save gate the boundary save persisted a
        NaN state and the run exited 0 ('checkpoint saved')."""
        from pytorch_scalablefhvae_tpu.config import OptimConfig

        cfg = make_cfg(tmp_path, "nan", "host", max_steps=4,
                       steps_per_dispatch=4)
        cfg = dataclasses.replace(
            cfg, optim=OptimConfig(learning_rate=1e18))
        with pytest.raises(SystemExit) as exc:
            train_from_config(cfg, data_root=corpus,
                              exp_root=tmp_path / "exp_nan",
                              is_preprocessed=True, verbose=False)
        assert exc.value.code == 2
        exp = next((tmp_path / "exp_nan").glob("**/config.json")).parent
        assert not list(exp.glob("*_e*s*.npz")), (
            "diverged state must not be checkpointed")

    def test_resume_at_cap_does_not_creep(self, corpus, tmp_path):
        """Resuming from a --max-steps boundary checkpoint with the SAME cap
        must exit before dispatching anything — after_dispatch only checks
        the cap after a bundle runs, so without the pre-loop guard each
        re-invocation crept the "stopped" run forward by a dispatch."""
        cfg = make_cfg(tmp_path, "cap", "host", ckpt_every_steps=3,
                       max_steps=5)
        killed = run(cfg, corpus, tmp_path, "cap")
        step0 = int(killed.state.step)
        assert step0 >= 5
        exp = next((tmp_path / "exp_cap").glob("**/config.json")).parent
        mid = max(exp.glob("*_e*s*.npz"),
                  key=lambda p: p.stat().st_mtime)
        again = run(cfg, corpus, tmp_path, "cap", continue_from=mid)
        assert int(again.state.step) == step0
        # and the params are byte-identical — nothing trained
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y)),
            killed.state.params, again.state.params,
        )
