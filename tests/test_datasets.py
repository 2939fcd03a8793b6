"""Dataset loaders (io/datasets.py): EuRoC ASL and TUM RGB-D layouts.

Fixtures are tiny generated directories in the two benchmark formats —
the parsing, calibration extraction, ground-truth association, and
view-pose conversion are what's under test (the reference's input layer
is console.cpp's VideoCapture + Device calibration plumbing)."""

import numpy as np
import pytest
from PIL import Image

from mageslam_tpu.io.datasets import (load_dataset, load_euroc,
                                      load_tum_rgbd)


def _png(path, w=32, h=24, seed=0):
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w), dtype=np.uint8),
                    "L").save(path)


@pytest.fixture
def euroc_dir(tmp_path):
    cam = tmp_path / "mav0" / "cam0"
    (cam / "data").mkdir(parents=True)
    stamps = [1403636579763555584 + i * 50000000 for i in range(4)]
    rows = []
    for i, ts in enumerate(stamps):
        _png(cam / "data" / f"{ts}.png", seed=i)
        rows.append(f"{ts},{ts}.png")
    (cam / "data.csv").write_text(
        "#timestamp [ns],filename\n" + "\n".join(rows) + "\n")
    (cam / "sensor.yaml").write_text(
        "sensor_type: camera\n"
        "rate_hz: 20\n"
        "resolution: [752, 480]\n"
        "camera_model: pinhole\n"
        "intrinsics: [458.654, 457.296, 367.215, 248.375]\n"
        "distortion_model: radial-tangential\n"
        "distortion_coefficients: [-0.28340811, 0.07395907, "
        "0.00019359, 1.76187114e-05]\n")
    gt = tmp_path / "mav0" / "state_groundtruth_estimate0"
    gt.mkdir(parents=True)
    gt_rows = ["#timestamp, p_RS_R_x [m], ..."]
    for i, ts in enumerate(stamps):
        gt_rows.append(f"{ts},{0.1 * i},0.0,1.0,1.0,0.0,0.0,0.0")
    (gt / "data.csv").write_text("\n".join(gt_rows) + "\n")
    imu = tmp_path / "mav0" / "imu0"
    imu.mkdir(parents=True)
    imu_rows = ["#timestamp,wx,wy,wz,ax,ay,az"]
    for i in range(8):
        imu_rows.append(f"{stamps[0] + i * 5000000},0.01,0.0,0.0,"
                        f"0.0,0.0,9.81")
    (imu / "data.csv").write_text("\n".join(imu_rows) + "\n")
    return tmp_path


@pytest.fixture
def tum_dir(tmp_path):
    root = tmp_path / "rgbd_dataset_freiburg1_xyz"
    (root / "rgb").mkdir(parents=True)
    rows = ["# color images"]
    for i in range(3):
        ts = 1305031102.175304 + i * 0.033
        _png(root / "rgb" / f"{ts:.6f}.png", seed=i)
        rows.append(f"{ts:.6f} rgb/{ts:.6f}.png")
    (root / "rgb.txt").write_text("\n".join(rows) + "\n")
    gt = ["# ground truth trajectory"]
    for i in range(6):
        ts = 1305031102.16 + i * 0.02
        gt.append(f"{ts:.4f} {0.05 * i:.4f} 0.0 0.5 0.0 0.0 0.0 1.0")
    (root / "groundtruth.txt").write_text("\n".join(gt) + "\n")
    return root


def test_euroc_frames_and_calibration(euroc_dir):
    seq = load_euroc(str(euroc_dir))
    assert len(seq.image_paths) == 4
    assert np.all(np.diff(seq.timestamps) > 0)
    assert float(seq.calibration.fx) == pytest.approx(458.654)
    assert seq.calibration.width == 752
    # distortion carried through (k1 from sensor.yaml)
    assert float(seq.calibration.dist[0]) == pytest.approx(-0.28340811)
    tcal = seq.tracking_calibration(320)
    assert tcal.width == 320
    assert float(tcal.fx) == pytest.approx(458.654 * 320 / 752)


def test_euroc_groundtruth_and_imu(euroc_dir):
    seq = load_euroc(str(euroc_dir))
    assert seq.gt_view_poses.shape == (4, 7)
    # identity rotation (w=1) -> view quat identity, t_view = -t_world
    np.testing.assert_allclose(seq.gt_view_poses[1, 4:],
                               [-0.1, 0.0, -1.0], atol=1e-6)
    gt = seq.gt_for_frames()
    assert gt.shape == (4, 7)
    assert seq.imu.gyro.shape == (8, 3)
    assert seq.imu.timestamps[0] == pytest.approx(
        seq.timestamps[0])


def test_tum_frames_gt(tum_dir):
    seq = load_tum_rgbd(str(tum_dir))
    assert len(seq.image_paths) == 3
    # freiburg1 intrinsics picked from the directory name
    assert float(seq.calibration.fx) == pytest.approx(517.3)
    gt = seq.gt_for_frames()
    assert gt.shape == (3, 7)
    # identity rotation rows -> view pose t = -t_world; the first image
    # (ts ~.1753) associates to the gt row at .18 (tx = 0.05).
    # quaternions are W-FIRST (repo convention): identity = [1, 0, 0, 0]
    np.testing.assert_allclose(gt[0, 4:], [-0.05, 0.0, -0.5], atol=1e-6)
    assert gt[0, 0] == pytest.approx(1.0)


def test_autodetect(euroc_dir, tum_dir, tmp_path):
    assert len(load_dataset(str(euroc_dir)).image_paths) == 4
    assert len(load_dataset(str(tum_dir)).image_paths) == 3
    flat = tmp_path / "flat"
    flat.mkdir()
    for i in range(2):
        _png(flat / f"img_{i}.png", seed=i)
    seq = load_dataset(str(flat))
    assert len(seq.image_paths) == 2
    assert seq.calibration.width == 32
    with pytest.raises(FileNotFoundError):
        load_dataset(str(tmp_path / "nope"))


def test_max_frames(euroc_dir):
    assert len(load_euroc(str(euroc_dir), max_frames=2).image_paths) == 2
