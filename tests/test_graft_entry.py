"""Driver-contract tests for __graft_entry__.

The driver compile-checks ``entry()`` single-chip and calls
``dryrun_multichip(8)`` in an environment where only ONE device may be
visible — the dry run must self-bootstrap a virtual CPU mesh in that case
(round-1 failure: MULTICHIP_r01.json rc=1).
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402

pytestmark = pytest.mark.slow  # subprocess jax bootstraps + mesh compiles


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    lb, log_qy, lb_rnn = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(lb)).all()
    assert np.isfinite(np.asarray(log_qy)).all()
    assert np.isfinite(np.asarray(lb_rnn)).all()  # recurrent FHVAE covered


def test_dryrun_inline_with_enough_devices():
    # conftest provisions 8 virtual CPU devices, so this takes the inline path
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_subprocess_bootstrap():
    # the driver-environment path: fewer visible devices than requested ->
    # re-exec against a virtual CPU backend in a child process
    graft._dryrun_in_subprocess(2)
