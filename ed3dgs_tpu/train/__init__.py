from . import densify, losses, optim, trainer  # noqa: F401
