"""Device-resident sample caching (rag_tpu.data.synthetic): LRU budget.

The cache exists to stop the axon-relay transfer leak (fresh host->device
batch transfers are retained until process exit); the LRU budget exists
so a multi-task run's accumulated sets cannot OOM the chip's HBM
(RESOURCE_EXHAUSTED measured mid-canonical-run, round 5) — least
recently used sets are evicted and re-uploaded on next touch."""

import numpy as np

import rag_tpu.data.synthetic as syn
from rag_tpu.data.synthetic import SyntheticStereoDataset, _maybe_device_cache


def _force_device_cache(monkeypatch):
    monkeypatch.setattr(syn, "_use_device_cache", lambda: True)
    monkeypatch.setattr(syn, "_dev_cache_bytes", 0)
    monkeypatch.setattr(syn, "_dev_cache_lru", [])


def test_cache_within_budget_is_device_resident(monkeypatch):
    _force_device_cache(monkeypatch)
    monkeypatch.setenv("RAG_TPU_DEVICE_DATA_BUDGET_MB", "64")
    ds = SyntheticStereoDataset(2, 16, 32, seed=0, max_disp=8.0)
    data = _maybe_device_cache(ds)
    assert not isinstance(data["left"], np.ndarray)  # jax array, cached
    assert ds._dev_cache is not None
    assert syn._dev_cache_bytes > 0


def test_single_dataset_over_budget_falls_back_to_numpy(monkeypatch, capsys):
    _force_device_cache(monkeypatch)
    monkeypatch.setenv("RAG_TPU_DEVICE_DATA_BUDGET_MB", "0")
    ds = SyntheticStereoDataset(2, 16, 32, seed=0, max_disp=8.0)
    data = _maybe_device_cache(ds)
    assert isinstance(data["left"], np.ndarray)  # host fallback
    assert getattr(ds, "_dev_cache", None) is None
    assert "exceeds the device cache budget" in capsys.readouterr().out


def test_lru_eviction_under_budget_pressure(monkeypatch, capsys):
    _force_device_cache(monkeypatch)
    a = SyntheticStereoDataset(2, 16, 32, seed=0, max_disp=8.0)
    one = sum(np.asarray(v).nbytes for v in a._samples().values())
    # room for ~1.5 datasets: caching the second must evict the first
    monkeypatch.setenv("RAG_TPU_DEVICE_DATA_BUDGET_MB",
                       str(one * 1.5 / 2**20))
    da = _maybe_device_cache(a)
    assert not isinstance(da["left"], np.ndarray)
    b = SyntheticStereoDataset(2, 16, 32, seed=1, max_disp=8.0)
    db = _maybe_device_cache(b)
    assert not isinstance(db["left"], np.ndarray)  # b IS cached
    assert a._dev_cache is None                    # a was evicted
    assert "evicting" in capsys.readouterr().out
    assert syn._dev_cache_lru == [b]
    # touching a again re-caches it, evicting b (LRU order respected)
    da = _maybe_device_cache(a)
    assert not isinstance(da["left"], np.ndarray)
    assert b._dev_cache is None
    assert syn._dev_cache_lru == [a]


def test_recency_refresh_protects_hot_dataset(monkeypatch):
    _force_device_cache(monkeypatch)
    a = SyntheticStereoDataset(2, 16, 32, seed=0, max_disp=8.0)
    one = sum(np.asarray(v).nbytes for v in a._samples().values())
    monkeypatch.setenv("RAG_TPU_DEVICE_DATA_BUDGET_MB",
                       str(one * 2.5 / 2**20))
    b = SyntheticStereoDataset(2, 16, 32, seed=1, max_disp=8.0)
    _maybe_device_cache(a)
    _maybe_device_cache(b)
    _maybe_device_cache(a)  # refresh a's recency -> b is now LRU
    c = SyntheticStereoDataset(2, 16, 32, seed=2, max_disp=8.0)
    _maybe_device_cache(c)
    assert b._dev_cache is None      # b evicted, not a
    assert a._dev_cache is not None
    assert c._dev_cache is not None
