from . import pallas_trace  # noqa: F401
