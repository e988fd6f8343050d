"""Training-curve SVG plots (train/plots.py) — the Visdom counterpart."""

from pytorch_scalablefhvae_tpu.train.metrics import MetricHistory
from pytorch_scalablefhvae_tpu.train.plots import SERIES, write_curves_svg


def test_write_curves_svg(tmp_path):
    h = MetricHistory()
    for ep in range(5):
        h.record(ep, 100.0 - ep, 90.0 - ep, -(90.0 - ep), 2.0 - 0.1 * ep)
    out = tmp_path / "curves.svg"
    assert write_curves_svg(h, out, run_id="run_test")
    svg = out.read_text()
    assert svg.lstrip().startswith("<?xml")
    for _, label in SERIES:
        assert label in svg  # legend entries match logger.py:22-27
    assert "run_test" in svg
    assert not out.with_suffix(".svg.tmp").exists()  # atomic rename cleaned up


def test_partial_history_and_update(tmp_path):
    """Sparse/partial history renders, and re-render replaces atomically."""
    h = MetricHistory()
    h.values["train_loss_results"][0] = 5.0  # only one series, one epoch
    out = tmp_path / "curves.svg"
    assert write_curves_svg(h, out)
    first = out.read_text()
    h.record(1, 4.0, 3.5, -3.5, 1.0)
    assert write_curves_svg(h, out)
    assert out.read_text() != first
