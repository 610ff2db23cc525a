"""Batched ray-primitive intersection (the wavefront's inner loop math).

All functions are shape-polymorphic pure jnp: rays broadcast against
primitives, so the same code serves the brute-force oracle (R x T dense),
the BVH leaf test (R x leaf), and future Pallas kernels.

Numeric conventions match the reference for image parity:
- Moller-Trumbore with fEpsilon = 1e-7 barycentric tolerance
  (src/GoblinTriangle.cpp:38-125)
- hit epsilon = 1e-3 * t (src/GoblinTriangle.cpp:84)
- sphere intersect via the stable quadratic (src/GoblinSphere.cpp:12-80)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import vecmath as vm

TRI_EPS = 1e-7
HIT_EPS_SCALE = 1e-3
BIG_T = 3.0e38  # "no hit" sentinel distance (< inf so arithmetic stays finite)


def moller_trumbore(o, d, v0, e1, e2, mint, maxt):
    """Ray/triangle test. All args broadcast; returns (hit, t, b1, b2).

    o, d: (..., 3) ray origin/direction; v0, e1, e2: (..., 3) triangle
    origin vertex and edge vectors; mint/maxt: (...) t-range.
    """
    s1 = jnp.cross(d, e2)
    divisor = vm.dot(s1, e1)
    inv = 1.0 / jnp.where(divisor == 0.0, 1e-30, divisor)
    s = o - v0
    b1 = vm.dot(s, s1) * inv
    s2 = jnp.cross(s, e1)
    b2 = vm.dot(d, s2) * inv
    t = vm.dot(e2, s2) * inv
    hit = (
        (divisor != 0.0)
        & (b1 + TRI_EPS >= 0.0)
        & (b1 - TRI_EPS <= 1.0)
        & (b2 + TRI_EPS >= 0.0)
        & (b1 + b2 - TRI_EPS <= 1.0)
        & (t >= mint)
        & (t <= maxt)
    )
    return hit, t, b1, b2


def brute_force_closest(o, d, v0, e1, e2, mint, maxt):
    """Dense closest-hit oracle: rays (R,3) x triangles (T,3).

    Returns (hit: (R,), t: (R,), tri_id: (R,), b1: (R,), b2: (R,)).
    Memory is O(R*T) — for tests and small scenes; production path goes
    through the BVH.
    """
    ro = o[:, None, :]
    rd = d[:, None, :]
    hit, t, b1, b2 = moller_trumbore(
        ro, rd, v0[None], e1[None], e2[None], mint[:, None], maxt[:, None]
    )
    t_masked = jnp.where(hit, t, BIG_T)
    best = jnp.argmin(t_masked, axis=1)
    r = jnp.arange(o.shape[0])
    best_t = t_masked[r, best]
    any_hit = best_t < BIG_T
    return any_hit, best_t, best, b1[r, best], b2[r, best]


def brute_force_occluded(o, d, v0, e1, e2, mint, maxt):
    """Dense any-hit oracle: True where the segment [mint, maxt] is blocked."""
    hit, _, _, _ = moller_trumbore(
        o[:, None, :], d[:, None, :], v0[None], e1[None], e2[None],
        mint[:, None], maxt[:, None],
    )
    return jnp.any(hit, axis=1)


# ---------------------------------------------------------------------------
# Analytic quadrics (world-space, uniform scale assumed — reference applies
# instancing by inverse-ray transform; we bake center/radius/frame instead)
# ---------------------------------------------------------------------------


def intersect_sphere(o, d, center, radius, mint, maxt):
    """Ray/sphere. Returns (hit, t). o,d (...,3); center (...,3); radius (...)."""
    co = o - center
    A = vm.dot(d, d)
    B = 2.0 * vm.dot(co, d)
    C = vm.dot(co, co) - radius * radius
    has, t1, t2 = vm.quadratic(A, B, C)
    # nearest root inside [mint, maxt] (reference picks t1 then falls to t2)
    t1_ok = (t1 >= mint) & (t1 <= maxt)
    t2_ok = (t2 >= mint) & (t2 <= maxt)
    t = jnp.where(t1_ok, t1, t2)
    hit = has & (t1_ok | t2_ok)
    return hit, jnp.where(hit, t, BIG_T)


def intersect_disk(o, d, center, normal, radius, mint, maxt):
    """Ray/disk (plane through center with `normal`, radius bound)."""
    denom = vm.dot(d, normal)
    t = vm.dot(center - o, normal) / jnp.where(denom == 0.0, 1e-30, denom)
    p = o + t[..., None] * d
    in_disk = vm.squared_length(p - center) <= radius * radius
    hit = (denom != 0.0) & (t >= mint) & (t <= maxt) & in_disk
    return hit, jnp.where(hit, t, BIG_T)


def intersect_aabb(o, inv_d, bmin, bmax, mint, maxt):
    """Slab test. Returns (hit, t_near). All broadcastable.

    o, inv_d: (..., 3); bmin/bmax: (..., 3). Matches the reference slab
    logic (src/GoblinBBox.cpp:57-77) vectorized over lanes.
    """
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    t_near_axis = jnp.minimum(t0, t1)
    t_far_axis = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(t_near_axis, axis=-1), mint)
    t_far = jnp.minimum(jnp.min(t_far_axis, axis=-1), maxt)
    return t_near <= t_far, t_near
