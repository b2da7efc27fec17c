from . import camera_math, projection, quaternion, sh, sym3  # noqa: F401
