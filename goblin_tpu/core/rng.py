"""Counter-based stateless RNG streams for the wavefront renderer.

The reference seeds one mt19937 per render task from ``rand()`` (non
reproducible across runs — src/GoblinUtils.cpp:13-56, GoblinRenderer.cpp:19).
Here every random dimension is a pure function of
(seed, pixel-id, sample-id, bounce, dimension) via threefry key folding,
giving bit-reproducible renders at any device count / sharding — the
property BASELINE.json's "seeded allclose" requires.

Usage:
    streams = RenderSampler(seed)
    u = streams.uniform_1d(pixel_ids, sample_ids, bounce, dim)      # (N,)
    u1, u2 = streams.uniform_2d(pixel_ids, sample_ids, bounce, dim) # (N,) x2
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mix(a, b):
    """Cheap 32-bit integer hash combine (xxhash-style avalanche)."""
    h = a.astype(jnp.uint32) * jnp.uint32(0x9E3779B1) + b.astype(jnp.uint32)
    h ^= h >> 15
    h *= jnp.uint32(0x85EBCA77)
    h ^= h >> 13
    h *= jnp.uint32(0xC2B2AE3D)
    h ^= h >> 16
    return h


def hash_uniform(seed, pixel, sample, bounce, dim):
    """Vectorized [0,1) uniform from integer coordinates.

    One fused hash per lane — far cheaper than per-lane threefry key
    folding, and statistically strong enough for MC estimation (PCG-style
    finalizer). All args broadcastable int32 arrays.
    """
    pixel = jnp.asarray(pixel)
    h = _mix(jnp.uint32(seed) + jnp.uint32(0x1234567), pixel.astype(jnp.uint32))
    h = _mix(h, jnp.asarray(sample).astype(jnp.uint32))
    h = _mix(h, jnp.asarray(bounce).astype(jnp.uint32) * jnp.uint32(0x01000193)
             + jnp.asarray(dim).astype(jnp.uint32))
    # take top 24 bits -> [0, 1) float32 with full mantissa coverage
    return (h >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


class RenderSampler:
    """Stateless sample-stream provider keyed by a render seed."""

    def __init__(self, seed: int):
        self.seed = int(seed)

    def uniform_1d(self, pixel, sample, bounce, dim):
        return hash_uniform(self.seed, pixel, sample, bounce, dim)

    def uniform_2d(self, pixel, sample, bounce, dim):
        return (
            hash_uniform(self.seed, pixel, sample, bounce, dim),
            hash_uniform(self.seed, pixel, sample, bounce, dim + 1),
        )

    def key(self, *ids):
        """A jax PRNG key folded over integer ids (for bulk jax.random use)."""
        k = jax.random.PRNGKey(self.seed)
        for i in ids:
            k = jax.random.fold_in(k, i)
        return k
