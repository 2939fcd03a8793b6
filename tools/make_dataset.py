"""Render a real-photo-textured sequence to an EuRoC-format directory.

Produces the exact on-disk layout io/datasets.load_euroc consumes:

    <out>/mav0/cam0/data/<ns>.png      grayscale frames
    <out>/mav0/cam0/data.csv           "#timestamp [ns],filename"
    <out>/mav0/cam0/sensor.yaml        intrinsics
    <out>/mav0/state_groundtruth_estimate0/data.csv
                                       "#ts, px,py,pz, qw,qx,qy,qz" (world)

Usage:
    python tools/make_dataset.py --out tests/data/mini_seq --frames 40
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--scenario", default="orbit",
                    choices=["orbit", "ring"])
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from mageslam_tpu.geometry import se3
    from mageslam_tpu.io.real_texture import (create_real_cloud,
                                              create_real_ring)
    from mageslam_tpu.io.synthetic import (default_calibration,
                                           loop_trajectory,
                                           orbit_trajectory)

    cal = default_calibration()
    if args.scenario == "orbit":
        world = create_real_cloud(700, seed=3)
        poses = orbit_trajectory(args.frames, radius=2.0, forward=0.02,
                                 sweep=0.9)
    else:
        world = create_real_ring(900, seed=5)
        poses = loop_trajectory(args.frames, radius=3.0)

    cam_dir = os.path.join(args.out, "mav0", "cam0")
    data_dir = os.path.join(cam_dir, "data")
    gt_dir = os.path.join(args.out, "mav0",
                          "state_groundtruth_estimate0")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)

    rows = []
    gt_rows = []
    for i, p in enumerate(poses):
        img = world.render(cal, p, seed=900 + i)
        ns = int((i / 30.0) * 1e9)
        name = f"{ns}.png"
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(data_dir, name))
        rows.append(f"{ns},{name}")
        # gt: world-from-camera (EuRoC convention: p_WB, q_WB)
        inv = np.asarray(se3.pose_inverse(jnp.asarray(p)))
        q, t = inv[:4], inv[4:]
        # pose_inverse gives camera-from-world inverse = world-from-camera
        c = np.asarray(se3.camera_center(jnp.asarray(p)))
        gt_rows.append(f"{ns},{c[0]},{c[1]},{c[2]},"
                       f"{q[0]},{q[1]},{q[2]},{q[3]}")

    with open(os.path.join(cam_dir, "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        f.write("\n".join(rows) + "\n")
    with open(os.path.join(cam_dir, "sensor.yaml"), "w") as f:
        f.write("sensor_type: camera\n"
                "intrinsics: [%f, %f, %f, %f]\n"
                "resolution: [%d, %d]\n"
                "distortion_model: radial-tangential\n"
                "distortion_coefficients: [0.0, 0.0, 0.0, 0.0]\n"
                % (cal.fx, cal.fy, cal.cx, cal.cy, cal.width, cal.height))
    with open(os.path.join(gt_dir, "data.csv"), "w") as f:
        f.write("#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m], "
                "q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z []\n")
        f.write("\n".join(gt_rows) + "\n")
    total = sum(os.path.getsize(os.path.join(data_dir, f))
                for f in os.listdir(data_dir))
    print(f"wrote {len(rows)} frames to {args.out} "
          f"({total/1024:.0f} KiB of PNGs)")


if __name__ == "__main__":
    main()
