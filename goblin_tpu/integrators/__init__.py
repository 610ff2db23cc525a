from . import ao, common  # noqa: F401
