from . import lights  # noqa: F401
