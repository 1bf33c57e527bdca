from . import asw_kernel  # noqa: F401
