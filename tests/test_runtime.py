"""Native C++ runtime tests: PNG/PFM decode parity with PIL/numpy, and the
threaded prefetch loader."""

import os

import numpy as np
import pytest

from rag_tpu.runtime.native import (
    NativeStereoLoader,
    native_available,
    read_pfm_native,
    read_png_native,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native runtime not built")


def _write_rgb_png(path, arr):
    from PIL import Image

    Image.fromarray(arr, "RGB").save(path)


def _write_gray16_png(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint16), "I;16").save(path)


def _write_pfm(path, arr):
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{arr.shape[1]} {arr.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        f.write(np.flipud(arr).astype("<f4").tobytes())


class TestDecoders:
    def test_png_rgb_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 256, (37, 53, 3), np.uint8)
        p = str(tmp_path / "x.png")
        _write_rgb_png(p, arr)
        out = read_png_native(p)
        np.testing.assert_allclose(out, arr.astype(np.float32) / 255.0,
                                   atol=1e-6)

    def test_png_gray16_disparity(self, tmp_path):
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 65535, (21, 33), np.uint16)
        p = str(tmp_path / "d.png")
        _write_gray16_png(p, arr)
        out = read_png_native(p)
        np.testing.assert_allclose(out, arr.astype(np.float32) / 256.0,
                                   atol=1e-4)

    def test_pfm_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        arr = rng.standard_normal((17, 29)).astype(np.float32)
        p = str(tmp_path / "d.pfm")
        _write_pfm(p, arr)
        out = read_pfm_native(p)
        np.testing.assert_allclose(out, arr, atol=1e-6)
        # parity with the python reader
        from rag_tpu.data.readers import read_pfm

        py, _ = read_pfm(p)
        np.testing.assert_allclose(out, py, atol=1e-6)


class TestNativeLoader:
    def _make_scene(self, tmp_path, n=3, w=64, h=48):
        rng = np.random.default_rng(0)
        entries = []
        for i in range(n):
            l = str(tmp_path / f"l{i}.png")
            r = str(tmp_path / f"r{i}.png")
            d = str(tmp_path / f"d{i}.png")
            _write_rgb_png(l, rng.integers(0, 256, (h, w, 3), np.uint8))
            _write_rgb_png(r, rng.integers(0, 256, (h, w, 3), np.uint8))
            _write_gray16_png(d, rng.integers(0, 40 * 256, (h, w), np.uint16))
            entries.append([l, r, d])
        return entries

    def test_training_crops(self, tmp_path):
        entries = self._make_scene(tmp_path)
        loader = NativeStereoLoader(entries, True, crop=(32, 16),
                                    pad=(96, 64), n_threads=2)
        b = loader.next_batch(4)
        assert b["left"].shape == (4, 16, 32, 3)
        assert b["disparity"].shape == (4, 16, 32)
        assert np.isfinite(b["left"]).all()
        # disparity in the /256 convention
        assert b["disparity"].max() <= 41.0
        loader.close()

    def test_eval_padding(self, tmp_path):
        entries = self._make_scene(tmp_path, n=2, w=64, h=48)
        loader = NativeStereoLoader(entries, False, crop=(32, 16),
                                    pad=(96, 64), n_threads=1)
        b = loader.next_batch(2)
        assert b["left"].shape == (2, 64, 96, 3)
        # top pad rows are zero (pad 64-48=16 rows at the top)
        assert np.abs(b["left"][:, :16]).max() == 0.0
        # right pad cols are zero
        assert np.abs(b["left"][:, :, 64:]).max() == 0.0
        loader.close()

    def test_imagenet_normalization_matches_python(self, tmp_path):
        from rag_tpu.data.readers import normalize_imagenet, read_image

        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, (20, 24, 3), np.uint8)
        l = str(tmp_path / "l.png")
        _write_rgb_png(l, arr)
        _write_rgb_png(str(tmp_path / "r.png"), arr)
        _write_gray16_png(str(tmp_path / "d.png"),
                          rng.integers(0, 256, (20, 24), np.uint16))
        loader = NativeStereoLoader(
            [[l, str(tmp_path / "r.png"), str(tmp_path / "d.png")]],
            False, pad=(24, 20), n_threads=1)
        b = loader.next_batch(1)
        expected = normalize_imagenet(read_image(l))
        np.testing.assert_allclose(b["left"][0], expected, atol=1e-5)
        loader.close()


class TestWeatherStyles:
    """Per-scene appearance domains for synthetic scenes (the analogue of
    the reference's 4 weather conditions: appearance shift, identical
    geometry distribution)."""

    def test_styles_shift_appearance_not_geometry(self):
        import numpy as np

        from rag_tpu.data.synthetic import (WEATHER_STYLES,
                                            synthetic_stereo_batch)

        rngs = [np.random.default_rng(0) for _ in WEATHER_STYLES]
        batches = [synthetic_stereo_batch(r, 2, 24, 48, 32.0, style=st)
                   for r, st in zip(rngs, WEATHER_STYLES)]
        # same generator state + same geometry params -> identical
        # disparity fields across scenes
        for b in batches[1:]:
            np.testing.assert_array_equal(b["disparity"],
                                          batches[0]["disparity"])
        # appearance statistics differ scene to scene
        means = [float(b["left"].mean()) for b in batches]
        stds = [float(b["left"].std()) for b in batches]
        assert len({round(m, 2) for m in means}) > 1
        assert len({round(s, 2) for s in stds}) > 1
        # foggy scene is lower-contrast than clean
        assert stds[1] < stds[0]
        # rainy breaks exact left/right photometric consistency
        d = batches[2]
        assert float(np.abs(d["left"] - batches[0]["left"]).mean()) > 0.01
