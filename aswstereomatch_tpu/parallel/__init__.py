from . import mesh, tiling  # noqa: F401
