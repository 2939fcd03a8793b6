"""Native frame pump tests (C++ decode/prefetch vs PIL reference)."""

import numpy as np
import pytest

from mageslam_tpu.io import native_loader as nl


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image
    rng = np.random.default_rng(5)
    d = tmp_path_factory.mktemp("frames")
    paths = []
    for i in range(12):
        arr = rng.integers(0, 255, (96, 128), dtype=np.uint8)
        if i % 3 == 0:
            p = d / f"f{i:03d}.png"
            Image.fromarray(arr, "L").save(p)
        elif i % 3 == 1:
            p = d / f"f{i:03d}.pgm"
            with open(p, "wb") as f:
                f.write(b"P5\n128 96\n255\n" + arr.tobytes())
        else:
            p = d / f"f{i:03d}.png"
            Image.fromarray(
                np.stack([arr] * 3, -1), "RGB").save(p)
        paths.append(str(p))
    return d, paths


class TestNativeLoader:
    def test_library_builds(self):
        assert nl.native_available(), "native lib should build on this box"

    def test_read_matches_pil(self, image_dir):
        d, paths = image_dir
        a = nl.read_image_gray(paths[1], 128, 96)  # pgm, no resize
        b = nl._pil_read(paths[1], 128, 96)
        np.testing.assert_allclose(a, b, atol=1.0)

    def test_png_gray_decode(self, image_dir):
        d, paths = image_dir
        a = nl.read_image_gray(paths[0], 128, 96)
        b = nl._pil_read(paths[0], 128, 96)
        np.testing.assert_allclose(a, b, atol=2.0)

    def test_resize(self, image_dir):
        d, paths = image_dir
        a = nl.read_image_gray(paths[1], 64, 48)
        assert a.shape == (48, 64)
        b = nl._pil_read(paths[1], 64, 48)
        assert abs(float(a.mean()) - float(b.mean())) < 2.0

    def test_pump_ordered_iteration(self, image_dir):
        d, paths = image_dir
        pump = nl.FramePump(paths, 64, 48, capacity=4, n_threads=3)
        got = list(pump)
        assert [i for i, _ in got] == list(range(len(paths)))
        assert all(f.shape == (48, 64) for _, f in got)
        assert pump.decode_errors() == 0
        pump.close()

    def test_pump_handles_bad_file(self, image_dir, tmp_path):
        d, paths = image_dir
        bad = tmp_path / "bad.png"
        bad.write_bytes(b"not an image at all")
        pump = nl.FramePump([paths[0], str(bad), paths[3]], 64, 48)
        got = list(pump)
        assert [i for i, _ in got] == [0, 2]
        assert pump.decode_errors() == 1
        pump.close()

    def test_scan_dataset_layouts(self, tmp_path, image_dir):
        d, paths = image_dir
        # EuRoC layout
        euroc = tmp_path / "euroc" / "mav0" / "cam0" / "data"
        euroc.mkdir(parents=True)
        import shutil
        shutil.copy(paths[0], euroc / "0001.png")
        found = nl.scan_dataset(str(tmp_path / "euroc"))
        assert len(found) == 1
        # flat layout
        found2 = nl.scan_dataset(str(d))
        assert len(found2) == len(paths)
