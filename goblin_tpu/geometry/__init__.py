from . import intersect, mesh  # noqa: F401
