from . import bvh, traverse  # noqa: F401
