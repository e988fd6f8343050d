"""Capture device-plane evidence for the fbank Pallas demotion decision.

VERDICT r03 item 10: the fused Pallas log-mel kernel
(ops/fbank_pallas.py) wins on its own device plane but NOT on end-to-end
wall clock (BENCH_r04: the jnp window+DFT+mag+mel+log chain measures at or
above the kernel's Mframes/s), so ``--fbank-pallas auto`` resolves to the
jnp chain (features/dsp_jax.py) and the kernel is an explicit "always"
opt-in. This script commits the evidence behind that gate: it profiles
both paths on the real TPU with jax.profiler, parses the xplane TPU
device plane, and writes ``misc/fbank_xplane_evidence.json`` with

- per-path total device-plane busy time and derived device Mframes/s
  (the kernel's genuine rate, free of dispatch/tunnel wall overhead),
- per-path wall Mframes/s measured the same way bench.py does
  (64 extractions inside ONE dispatched lax.scan, host-fetch sync),
- the speedup ratios that justify the default.

Run from the repo root on a TPU host:
``python misc/gen_fbank_xplane_evidence.py`` (commit the JSON).
"""

from __future__ import annotations

import collections
import glob
import json
import os
import time
from pathlib import Path

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

N_FRAMES = 6400  # TIMIT-utterance-batch frame count (matches bench.py)
ITERS = 64
N_MELS = 80


def _build(use_pallas: bool):
    from pytorch_scalablefhvae_tpu.features.dsp_jax import _spectral_consts
    from pytorch_scalablefhvae_tpu.ops.fbank_pallas import (
        fused_logmel_frames,
        logmel_frames_reference,
    )

    w, C, S, fb = _spectral_consts(16000, 400, 400, "hamming", N_MELS,
                                   "slaney", True)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((N_FRAMES, 400)), jnp.float32)

    @jax.jit
    def run(frames):
        def body(carry, _):
            f = frames + carry * 1e-12  # keep iterations data-dependent
            if use_pallas:
                out = fused_logmel_frames(f, w, C, S, fb.T)
            else:
                out = logmel_frames_reference(f, w, C, S, fb.T)
            return jnp.sum(out), ()

        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return s

    return run, frames


def _device_busy_ps(profile_dir: str) -> tuple[int, dict]:
    """Total TPU device-plane busy picoseconds + top ops, from the xplane.

    The tensorboard profile plugin's converter is broken in this image;
    parse the raw xplane proto instead (pure-python protobuf impl).
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(f"{profile_dir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    total = 0
    agg: collections.Counter = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                n = ev_meta.get(ev.metadata_id, "?")
                total += ev.duration_ps
                agg[n.split(".")[0].lstrip("%")] += ev.duration_ps
    top = {n: round(d / 1e9, 3) for n, d in agg.most_common(8)}
    return total, top


def measure(use_pallas: bool) -> dict:
    run, frames = _build(use_pallas)
    _ = float(np.asarray(run(frames)))  # compile + real sync (tunnel rig:
    # block_until_ready returns early; a host fetch is the only true sync)
    best_wall = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(frames)))
        best_wall = min(best_wall, (time.perf_counter() - t0) / ITERS)

    prof_dir = f"/tmp/fbank_prof_{'pallas' if use_pallas else 'jnp'}"
    with jax.profiler.trace(prof_dir):
        _ = float(np.asarray(run(frames)))
    busy_ps, top = _device_busy_ps(prof_dir)
    per_iter_s = busy_ps / 1e12 / ITERS
    return {
        "wall_mframes_per_s": round(N_FRAMES / best_wall / 1e6, 2),
        "device_plane_mframes_per_s": round(N_FRAMES / per_iter_s / 1e6, 2),
        "device_busy_ms_per_iter": round(per_iter_s * 1e3, 4),
        "top_device_ops_ms_total": top,
    }


def main() -> None:
    assert jax.default_backend() == "tpu", (
        "evidence must be captured on the real TPU device plane")
    out = {
        "what": "fused Pallas log-mel kernel vs jnp chain, device plane + wall",
        "config": {"n_frames": N_FRAMES, "iters_per_dispatch": ITERS,
                   "n_fft": 400, "n_mels": N_MELS,
                   "device": jax.devices()[0].device_kind},
        "jnp_chain": measure(False),
        "pallas_kernel": measure(True),
    }
    out["kernel_device_speedup"] = round(
        out["jnp_chain"]["device_busy_ms_per_iter"]
        / out["pallas_kernel"]["device_busy_ms_per_iter"], 3)
    out["kernel_wall_speedup"] = round(
        out["pallas_kernel"]["wall_mframes_per_s"]
        / out["jnp_chain"]["wall_mframes_per_s"], 3)
    out["decision"] = (
        "auto=jnp: kernel wins the device plane but not wall; extraction "
        "is <1% of preprocess time, so the jnp chain is the default and "
        "--fbank-pallas always opts in")
    path = Path(__file__).resolve().parent / "fbank_xplane_evidence.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
