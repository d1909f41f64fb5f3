from . import advect, cylinder, physics, stencil  # noqa: F401
