from . import rng, sampling, vecmath  # noqa: F401
