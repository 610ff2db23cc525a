from . import exr  # noqa: F401
