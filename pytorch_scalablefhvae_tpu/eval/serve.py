"""Persistent encode serving: JSONL requests in, JSONL responses out.

``sfhvae serve EXP_DIR`` loads the experiment ONCE (checkpoint + MVN stats)
and then answers encode requests line-by-line on stdin — the production
counterpart of one-shot ``sfhvae encode``, which pays checkpoint-load plus
XLA compilation on every invocation. Because every batch pads to the fixed
serving batch size, the encoder programs compile on the first request and
every later request runs from jit cache (~ms dispatch instead of ~tens of
seconds of load+compile).

Protocol (one JSON object per line):

    request:  {"id": "r1", "inputs": ["a.wav", "dir/", "wav.scp"],
               "output_dir": "out/r1"}          # output_dir optional
    response: {"id": "r1", "ok": true, "utterances": N, "segments": M,
               "sequences": [...], "mu2_map": [[...]...],
               "z1_seq_mean": [[...]...], "output_dir": "out/r1"}

Per-utterance summaries (``mu2_map`` — the MAP speaker-factor estimate the
papers use at test time — and ``z1_seq_mean``) return inline: they are
O(utterances x latent_dim). Per-SEGMENT latents are written to
``output_dir`` (``latents.npz`` + ``sequences.json``, same artifact layout
as ``sfhvae encode``) when requested — inlining them would put megabytes of
floats through the pipe.

Control: {"cmd": "ping"} -> {"ok": true, "model_type": ..., ...};
{"cmd": "shutdown"} (or EOF) ends the loop. A malformed or failing request
answers {"ok": false, "error": ...} and the server keeps serving — one bad
WAV must not take down the process.

The reference has no serving surface at all (its eval_model.py is a stub,
/root/reference/eval_model.py:57-59); this extends the framework's own
encode tier (eval/encode.py).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from pytorch_scalablefhvae_tpu.eval.encode import EncodeSession


def _response_for(session: EncodeSession, req: dict) -> dict:
    rid = req.get("id")
    if req.get("cmd") == "ping":
        return {
            "id": rid, "ok": True,
            "model_type": session.model.model_type,
            "exp_dir": str(session.exp_dir),
            "batch_size": session.batch_size,
        }
    inputs = req.get("inputs")
    if not inputs or not isinstance(inputs, list):
        raise ValueError('request needs "inputs": [audio file | dir | scp]')
    out_dir = req.get("output_dir")
    result = session.encode(
        inputs,
        output_dir=out_dir,
        sample_rate=req.get("sample_rate"),
        verbose=False,
    )
    return {
        "id": rid, "ok": True,
        "utterances": len(result["sequences"]),
        "segments": int(len(result["seq_idx"])),
        "sequences": result["sequences"],
        "mu2_map": result["mu2_map"].tolist(),
        "z1_seq_mean": result["z1_seq_mean"].tolist(),
        "output_dir": str(Path(out_dir)) if out_dir else None,
    }


def serve(exp_dir, step: int = -1, batch_size: int = 2048,
          stdin=None, stdout=None) -> int:
    """Run the JSONL serving loop until EOF or a shutdown command.

    ``stdin``/``stdout`` are injectable for tests; default to the process
    streams. Returns the process exit code.
    """
    fin = stdin if stdin is not None else sys.stdin
    fout = stdout if stdout is not None else sys.stdout
    session = EncodeSession(exp_dir, step=step, batch_size=batch_size)

    def emit(obj: dict) -> None:
        fout.write(json.dumps(obj) + "\n")
        fout.flush()

    emit({"ok": True, "ready": True,
          "model_type": session.model.model_type,
          "exp_dir": str(session.exp_dir)})
    for line in fin:
        line = line.strip()
        if not line:
            continue
        rid = None
        try:
            req = json.loads(line)
            rid = req.get("id")
            if req.get("cmd") == "shutdown":
                emit({"id": rid, "ok": True, "bye": True})
                break
            emit(_response_for(session, req))
        except Exception as e:  # serving must survive any one bad request
            emit({"id": rid, "ok": False,
                  "error": f"{type(e).__name__}: {e}"})
    return 0
