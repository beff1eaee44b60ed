"""Device-resident sample caching (rag_tpu.data.synthetic): budget guard.

The cache exists to stop the axon-relay transfer leak (fresh host->device
batch transfers are retained until process exit); the budget exists so a
large --synthetic-size / --num-tasks config falls back to host batches
instead of eating the chip's HBM (ADVICE r4)."""

import numpy as np

import rag_tpu.data.synthetic as syn
from rag_tpu.data.synthetic import SyntheticStereoDataset, _maybe_device_cache


def _force_device_cache(monkeypatch):
    monkeypatch.setattr(syn, "_use_device_cache", lambda: True)
    monkeypatch.setattr(syn, "_dev_cache_bytes", 0)
    monkeypatch.setattr(syn, "_dev_budget_warned", False)


def test_cache_within_budget_is_device_resident(monkeypatch):
    _force_device_cache(monkeypatch)
    monkeypatch.setenv("RAG_TPU_DEVICE_DATA_BUDGET_MB", "64")
    ds = SyntheticStereoDataset(2, 16, 32, seed=0, max_disp=8.0)
    data = _maybe_device_cache(ds)
    assert not isinstance(data["left"], np.ndarray)  # jax array, cached
    assert ds._dev_cache is not None
    assert syn._dev_cache_bytes > 0


def test_cache_over_budget_falls_back_to_numpy(monkeypatch, capsys):
    _force_device_cache(monkeypatch)
    monkeypatch.setenv("RAG_TPU_DEVICE_DATA_BUDGET_MB", "0")
    ds = SyntheticStereoDataset(2, 16, 32, seed=0, max_disp=8.0)
    data = _maybe_device_cache(ds)
    assert isinstance(data["left"], np.ndarray)  # host fallback
    assert getattr(ds, "_dev_cache", None) is None
    out = capsys.readouterr().out
    assert "budget reached" in out
    # the warning is one-time per process
    _maybe_device_cache(SyntheticStereoDataset(2, 16, 32, seed=1))
    assert "budget reached" not in capsys.readouterr().out


def test_budget_accumulates_across_datasets(monkeypatch):
    _force_device_cache(monkeypatch)
    ds = SyntheticStereoDataset(2, 16, 32, seed=0, max_disp=8.0)
    one = sum(np.asarray(v).nbytes for v in ds._samples().values())
    # room for exactly one dataset: the second one must fall back
    monkeypatch.setenv("RAG_TPU_DEVICE_DATA_BUDGET_MB",
                       str(one * 1.5 / 2**20))
    a = _maybe_device_cache(ds)
    b = _maybe_device_cache(SyntheticStereoDataset(2, 16, 32, seed=1,
                                                   max_disp=8.0))
    assert not isinstance(a["left"], np.ndarray)
    assert isinstance(b["left"], np.ndarray)
