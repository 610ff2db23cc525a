"""Ambient occlusion integrator (reference src/GoblinAO.cpp:12-42).

Wavefront form: primary hits spawn all N hemisphere occlusion rays as ONE
flat (R*N,) any-hit batch through the BVH — the batched replacement for
the reference's per-hit sequential occlusion loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.rng import hash_uniform
from ..core.sampling import uniform_sample_hemisphere
from ..shading.bsdf import shading_frame, to_world
from ..scene import intersect as scn
from .common import DIM_BASE


def make_li(ao_sample_num: int):
    def li(scene, meta, ray, pixel_ids, s_idx, seed):
        frag = scn.intersect(
            scene, meta, ray["o"], ray["d"], ray["mint"], ray["maxt"]
        )
        R = ray["o"].shape[0]
        n = ao_sample_num
        t, b = shading_frame(frag["ns"], frag["dpdu"])
        # (R, n) occlusion directions
        u1 = hash_uniform(
            seed, pixel_ids[:, None], s_idx, 1,
            DIM_BASE + 2 * jnp.arange(n)[None, :],
        )
        u2 = hash_uniform(
            seed, pixel_ids[:, None], s_idx, 1,
            DIM_BASE + 2 * jnp.arange(n)[None, :] + 1,
        )
        d_local = uniform_sample_hemisphere(u1, u2)  # (R, n, 3)
        d_world = to_world(
            t[:, None, :], b[:, None, :], frag["ns"][:, None, :], d_local
        )
        o = jnp.broadcast_to(frag["p"][:, None, :], (R, n, 3)).reshape(-1, 3)
        d = d_world.reshape(-1, 3)
        mint = jnp.broadcast_to(frag["eps"][:, None], (R, n)).reshape(-1)
        maxt = jnp.full((R * n,), 3.0e37, jnp.float32)
        occ = scn.occluded(scene, meta, o, d, mint, maxt).reshape(R, n)
        # misses shouldn't count: mask whole lane by hit
        vis = jnp.mean(1.0 - occ.astype(jnp.float32), axis=-1)
        L = jnp.where(frag["hit"], vis, 0.0)
        return jnp.broadcast_to(L[:, None], (R, 3))

    return li
