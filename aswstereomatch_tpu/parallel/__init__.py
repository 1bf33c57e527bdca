from . import api, dshard, mesh, reshard, tiling  # noqa: F401
