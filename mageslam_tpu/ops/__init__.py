from mageslam_tpu.ops import pyramid, fast, orb, matching  # noqa: F401
