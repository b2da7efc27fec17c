from . import deformation, gaussians  # noqa: F401
