from .common import RasterOutputs  # noqa: F401
