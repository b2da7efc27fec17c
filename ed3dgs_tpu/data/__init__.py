from .cameras import Camera, CameraMatrices, look_at_camera  # noqa: F401
