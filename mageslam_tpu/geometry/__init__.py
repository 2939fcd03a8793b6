from mageslam_tpu.geometry import se3, sim3, camera, triangulation, epipolar  # noqa: F401
