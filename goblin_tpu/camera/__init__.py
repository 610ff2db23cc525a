from . import camera, film  # noqa: F401
from .camera import CameraSpec  # noqa: F401
from .film import FilmSpec, FilterSpec  # noqa: F401
