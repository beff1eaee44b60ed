"""Metric unit tests against the KITTI/matlab spec (VERDICT r2 #4).

The contract is the reference wrapper + metric bodies
(/root/reference/src/utilstool/metrics.py):
  * matlab semantics quoted at :7-13 — err counted when E > tau(1) AND
    E/|D_gt| > tau(2) (strict inequalities);
  * per-image wrapper :22-41 — an image is SKIPPED when
    mask.mean() / (gt > 0).mean() < 0.1 (so ratio == 0.1 is KEPT), and a
    batch where every image is skipped returns 0;
  * EPE :61-65 — mean |err| over the valid mask.

One deliberate divergence (documented, not replicated): when an image has
NO gt>0 pixels the reference divides by zero (nan), nan < 0.1 is False, the
image is kept, and the metric of an empty mask poisons the batch with nan.
The repo gives such images weight 0 instead.
"""

import numpy as np
import pytest

from rag_tpu.metrics.stereo import (
    d1_metric,
    epe_metric,
    stereo_metrics,
    thres_metric,
)


# ---- direct numpy port of the reference wrapper + metric bodies ----------

def _ref_wrapper(metric_func, d_ests, d_gts, masks, *args):
    results = []
    for i in range(d_gts.shape[0]):
        gt_mean = (d_gts[i] > 0).mean()
        if gt_mean == 0:
            # reference: nan < 0.1 -> kept -> nan; we pin the repo's fixed
            # behavior (skip) and never feed this case to the parity check
            continue
        if masks[i].mean() / gt_mean < 0.1:
            continue
        results.append(metric_func(d_ests[i], d_gts[i], masks[i], *args))
    if not results:
        return 0.0
    return float(np.mean(results))


def _ref_d1(d_est, d_gt, mask):
    e, g = d_est[mask], d_gt[mask]
    err = np.abs(g - e)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = err / np.abs(g)
    return float(((err > 3) & (ratio > 0.05)).mean())


def _ref_thres(d_est, d_gt, mask, tau):
    e, g = d_est[mask], d_gt[mask]
    return float((np.abs(g - e) > tau).mean())


def _ref_epe(d_est, d_gt, mask):
    e, g = d_est[mask], d_gt[mask]
    return float(np.abs(g - e).mean())


def _one(h=8, w=8, gt=30.0, est=30.0):
    d_gt = np.full((1, h, w), gt, np.float32)
    d_est = np.full((1, h, w), est, np.float32)
    mask = np.ones((1, h, w), bool)
    return d_est, d_gt, mask


class TestD1Boundaries:
    def test_err_exactly_3px_not_counted(self):
        # err == 3 fails the strict E > 3 test even though 3/30 = 10% > 5%
        d_est, d_gt, mask = _one(gt=30.0, est=27.0)
        assert float(d1_metric(d_est, d_gt, mask)) == 0.0

    def test_err_just_over_3px_counted(self):
        d_est, d_gt, mask = _one(gt=30.0, est=26.99)
        assert float(d1_metric(d_est, d_gt, mask)) == 1.0

    def test_ratio_exactly_5pct_not_counted(self):
        # err = 4 > 3 px, but 4/80 = 5% exactly fails the strict > 0.05
        d_est, d_gt, mask = _one(gt=80.0, est=76.0)
        assert float(d1_metric(d_est, d_gt, mask)) == 0.0

    def test_ratio_just_over_5pct_counted(self):
        d_est, d_gt, mask = _one(gt=80.0, est=75.99)
        assert float(d1_metric(d_est, d_gt, mask)) == 1.0

    def test_large_err_small_ratio_not_counted(self):
        # big absolute error on a huge disparity: 5px on 200 = 2.5%
        d_est, d_gt, mask = _one(gt=200.0, est=195.0)
        assert float(d1_metric(d_est, d_gt, mask)) == 0.0

    def test_thres_strict(self):
        d_est, d_gt, mask = _one(gt=30.0, est=29.0)
        assert float(thres_metric(d_est, d_gt, mask, 1.0)) == 0.0
        assert float(thres_metric(d_est, d_gt, mask, 0.99)) == 1.0


class TestSkipRule:
    def _batch(self, cover):
        """One 10x10 image, gt>0 everywhere, mask covering `cover` of it."""
        d_gt = np.full((1, 10, 10), 50.0, np.float32)
        d_est = np.full((1, 10, 10), 40.0, np.float32)  # err 10px = 20%
        mask = np.zeros((1, 10, 10), bool)
        k = int(round(cover * 100))
        mask.reshape(1, -1)[0, :k] = True
        return d_est, d_gt, mask

    def test_ratio_exactly_01_kept(self):
        # reference skips only ratio < 0.1; == 0.1 is evaluated
        d_est, d_gt, mask = self._batch(0.10)
        assert float(d1_metric(d_est, d_gt, mask)) == 1.0
        assert float(epe_metric(d_est, d_gt, mask)) == pytest.approx(10.0)

    def test_ratio_just_under_01_skipped(self):
        d_est, d_gt, mask = self._batch(0.09)
        assert float(d1_metric(d_est, d_gt, mask)) == 0.0
        assert float(epe_metric(d_est, d_gt, mask)) == 0.0

    def test_all_images_skipped_returns_zero(self):
        # wrapper :36-38: empty result list -> tensor(0)
        d_est0, d_gt0, mask0 = self._batch(0.05)
        d_est1, d_gt1, mask1 = self._batch(0.0)
        d_est = np.concatenate([d_est0, d_est1])
        d_gt = np.concatenate([d_gt0, d_gt1])
        mask = np.concatenate([mask0, mask1])
        for v in stereo_metrics(d_est, d_gt, mask).values():
            assert float(v) == 0.0

    def test_skipped_image_does_not_dilute(self):
        # batch of [kept(err=10px), skipped]: mean over KEPT images only
        d_est0, d_gt0, mask0 = self._batch(1.0)
        d_est1, d_gt1, mask1 = self._batch(0.05)
        d_est = np.concatenate([d_est0, d_est1])
        d_gt = np.concatenate([d_gt0, d_gt1])
        mask = np.concatenate([mask0, mask1])
        assert float(epe_metric(d_est, d_gt, mask)) == pytest.approx(10.0)

    def test_no_gt_image_gives_zero_not_nan(self):
        # the documented deliberate divergence from the reference
        d_gt = np.zeros((1, 8, 8), np.float32)
        d_est = np.ones((1, 8, 8), np.float32)
        mask = np.zeros((1, 8, 8), bool)
        assert float(epe_metric(d_est, d_gt, mask)) == 0.0


class TestParityWithReferencePort:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_batches(self, seed):
        rng = np.random.default_rng(seed)
        b, h, w = 6, 24, 32
        d_gt = rng.uniform(0.5, 180.0, (b, h, w)).astype(np.float32)
        d_est = (d_gt + rng.normal(0, 6.0, (b, h, w))).astype(np.float32)
        # heterogeneous masks: full / sparse / borderline coverage
        mask = rng.uniform(size=(b, h, w)) < rng.uniform(
            0.02, 1.0, (b, 1, 1))
        mask &= d_gt > 0
        got = {k: float(v) for k, v in
               stereo_metrics(d_est, d_gt, mask).items()}
        want = {
            "D1": _ref_wrapper(_ref_d1, d_est, d_gt, mask),
            "EPE": _ref_wrapper(_ref_epe, d_est, d_gt, mask),
            "Thres1": _ref_wrapper(_ref_thres, d_est, d_gt, mask, 1.0),
            "Thres2": _ref_wrapper(_ref_thres, d_est, d_gt, mask, 2.0),
            "Thres3": _ref_wrapper(_ref_thres, d_est, d_gt, mask, 3.0),
        }
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-5, abs=1e-6), k


def test_update_batched_is_bit_identical_to_sequential():
    """update_batched transfers the same f32 scalars in one fetch — every
    meter value must match the per-batch float() path bit-for-bit."""
    import jax.numpy as jnp

    from rag_tpu.metrics.meters import AverageMeterDict

    rng = np.random.default_rng(0)
    outs = [{"loss": jnp.float32(rng.standard_normal()),
             "D1": jnp.float32(rng.uniform()),
             "EPE": jnp.float32(rng.uniform(0, 30))} for _ in range(7)]
    seq = AverageMeterDict()
    for o in outs:
        seq.update({k: float(v) for k, v in o.items()})
    bat = AverageMeterDict().update_batched(outs)
    assert seq.count == bat.count
    for k in seq.data:
        assert seq.data[k] == bat.data[k], k  # exact, not approx
    assert AverageMeterDict().update_batched([]).mean() == {}
