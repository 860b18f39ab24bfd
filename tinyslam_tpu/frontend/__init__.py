from tinyslam_tpu.frontend.orb import OrbFrontend  # noqa: F401
