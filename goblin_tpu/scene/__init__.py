from . import bake, intersect, loader, params  # noqa: F401
from .loader import load_scene  # noqa: F401
