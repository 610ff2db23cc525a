from . import bsdf, textures  # noqa: F401
