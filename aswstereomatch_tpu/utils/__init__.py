from . import colorspace, evaluate, io, synthetic  # noqa: F401
