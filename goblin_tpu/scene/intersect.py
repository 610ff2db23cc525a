"""Wavefront scene intersection: BVH trace + analytic prims + hit refine.

The reference's Scene::intersect returns a full Intersection object per
ray recursively (src/GoblinScene.cpp:75-95). Here the whole ray batch is
traced (accel/traverse), analytic spheres are tested densely, and a
*refine* stage gathers per-triangle shading data to build the batched
fragment dict — the wavefront analogue of Fragment
(src/GoblinGeometry.h:13-130):

    frag = {p, ns, ng, uv, dpdu, mat, light, eps, hit, t, wo}

Epsilon conventions: hit eps = 1e-3 * t (src/GoblinTriangle.cpp:84).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..accel.traverse import TraceResult, trace
from ..core import vecmath as vm
from ..geometry.intersect import BIG_T, intersect_sphere
from .bake import SceneMeta

HIT_EPS_SCALE = 1e-3


def trace_rays(scene, meta: SceneMeta, o, d, mint, maxt, any_hit=False):
    """BVH trace over the wavefront, dispatched by meta.trace_backend.

    pallas: the VMEM packet kernel (ops/pallas_trace.trace_packets) —
    rays padded to a whole number of trace_rows*128 packets with dead
    rays (mint=BIG_T, maxt=0) whose box tests always fail. jnp: the
    lockstep skip-link traversal. Both replace the reference's per-thread
    stack walk (src/GoblinBVH.cpp:156-280).
    """
    if meta.trace_backend != "pallas" or "pk_nodes" not in scene:
        return trace(
            scene["node_bounds"], scene["node_meta"], scene["tri_soup"],
            o, d, mint, maxt, max_leaf=meta.max_leaf, any_hit=any_hit,
        )
    from ..ops.pallas_trace import trace_packets

    R = o.shape[0]
    packet = meta.trace_rows * 128
    pad = (-R) % packet
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        mint = jnp.concatenate([mint, jnp.full((pad,), BIG_T, mint.dtype)])
        maxt = jnp.concatenate([maxt, jnp.zeros((pad,), maxt.dtype)])
    hit, t, tri, b1, b2 = trace_packets(
        scene["pk_nodes"], scene["pk_meta"], scene["pk_tris"],
        o, d, mint, maxt,
        max_leaf=meta.max_leaf, any_hit=any_hit, rows=meta.trace_rows,
    )
    if pad:
        hit, t, tri, b1, b2 = (v[:R] for v in (hit, t, tri, b1, b2))
    return TraceResult(hit, t, tri, b1, b2)


def _sphere_pass(scene, o, d, mint, cur_t):
    """Dense test against analytic spheres; returns (hit_id, t) with
    hit_id = -1 when no sphere beats cur_t."""
    S = scene["sph_center"].shape[0]
    best_t = cur_t
    best = jnp.full(o.shape[:-1], -1, jnp.int32)
    for s in range(S):  # S is small and static
        hit, t = intersect_sphere(
            o, d, scene["sph_center"][s], scene["sph_radius"][s], mint, best_t
        )
        upd = hit & (t < best_t)
        best_t = jnp.where(upd, t, best_t)
        best = jnp.where(upd, s, best)
    return best, best_t


def intersect(scene, meta: SceneMeta, o, d, mint, maxt):
    """Closest-hit over the whole scene. Returns the fragment dict.

    The discrete traversal decision (which triangle) is non-differentiable
    and wrapped in stop_gradient; shading quantities are then recomputed
    from gathered primitive data so VJPs flow through materials/lights
    (SURVEY.md §7: differentiable layer — reparameterized visibility for
    geometry gradients is future work).
    """
    res = trace_rays(
        jax.lax.stop_gradient(scene), meta,
        jax.lax.stop_gradient(o), jax.lax.stop_gradient(d),
        jax.lax.stop_gradient(mint), jax.lax.stop_gradient(maxt),
    )
    t = res.t
    tri = res.tri
    b1, b2 = res.b1, res.b2
    hit = res.hit

    sph_id = None
    if meta.n_spheres > 0:
        sph_id, t2 = _sphere_pass(scene, o, d, mint, t)
        sph_hit = sph_id >= 0
        hit = hit | sph_hit
        t = jnp.where(sph_hit, t2, t)
    else:
        sph_hit = jnp.zeros_like(hit)

    # --- refine triangles
    tri_c = jnp.maximum(tri, 0)
    soup = jnp.take(scene["tri_soup"], tri_c, axis=0)
    v0, e1, e2 = soup[..., 0:3], soup[..., 3:6], soup[..., 6:9]

    # Differentiable hit recompute (SURVEY.md §7): the traversal's discrete
    # pick (which triangle) is detached, but t and the barycentrics are
    # re-derived by Möller–Trumbore on the *non-detached* gathered triangle
    # so hit points / normals / uvs carry gradients w.r.t. vertex positions.
    pvec = jnp.cross(d, e2)
    det_mt = vm.dot(e1, pvec)
    inv_mt = 1.0 / jnp.where(jnp.abs(det_mt) < 1e-20, 1.0, det_mt)
    tvec = o - v0
    b1_d = vm.dot(tvec, pvec) * inv_mt
    qvec = jnp.cross(tvec, e1)
    b2_d = vm.dot(d, qvec) * inv_mt
    t_d = vm.dot(e2, qvec) * inv_mt
    tri_hit = hit & ~sph_hit & (tri >= 0) & (jnp.abs(det_mt) >= 1e-20)
    t = jnp.where(tri_hit, t_d, t)
    b1 = jnp.where(tri_hit, b1_d, b1)
    b2 = jnp.where(tri_hit, b2_d, b2)

    # miss lanes keep t = BIG_T; clamp the t used for the shading point so
    # no inf enters downstream math (inf * 0 = NaN in the backward pass —
    # miss-lane values are masked by `hit` everywhere they matter)
    p = o + jnp.where(hit, t, 1.0)[..., None] * d
    b0 = 1.0 - b1 - b2
    n_rows = jnp.take(scene["tri_n"], tri_c, axis=0)  # (R, 3, 3)
    ns_tri = vm.normalize(
        b0[..., None] * n_rows[..., 0, :]
        + b1[..., None] * n_rows[..., 1, :]
        + b2[..., None] * n_rows[..., 2, :],
        eps=1e-30,
    )
    ng_tri = vm.normalize(jnp.cross(e1, e2), eps=1e-30)
    uv_rows = jnp.take(scene["tri_uv"], tri_c, axis=0)  # (R, 3, 2)
    uv_tri = (
        b0[..., None] * uv_rows[..., 0, :]
        + b1[..., None] * uv_rows[..., 1, :]
        + b2[..., None] * uv_rows[..., 2, :]
    )
    # dpdu from the uv edge matrix (src/GoblinTriangle.cpp:107-122)
    du1 = uv_rows[..., 1, 0] - uv_rows[..., 0, 0]
    dv1 = uv_rows[..., 1, 1] - uv_rows[..., 0, 1]
    du2 = uv_rows[..., 2, 0] - uv_rows[..., 0, 0]
    dv2 = uv_rows[..., 2, 1] - uv_rows[..., 0, 1]
    det = du1 * dv2 - dv1 * du2
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1.0, det)
    dpdu_tri = inv_det[..., None] * (dv2[..., None] * e1 - dv1[..., None] * e2)
    degenerate = jnp.abs(det) < 1e-20
    fallback, _ = vm.coordinate_system(ns_tri)
    dpdu_tri = jnp.where(degenerate[..., None], fallback, dpdu_tri)
    mat_tri = jnp.take(scene["tri_mat"], tri_c)
    light_tri = jnp.take(scene["tri_light"], tri_c)

    if meta.n_spheres > 0:
        sc = jnp.take(scene["sph_center"], jnp.maximum(sph_id, 0), axis=0)
        sr = jnp.take(scene["sph_radius"], jnp.maximum(sph_id, 0))
        ns_s = vm.normalize(p - sc, eps=1e-30)
        # spherical uv (phi/2pi, theta/pi) and dpdu along longitude
        phi = vm.spherical_phi(ns_s)
        theta = vm.spherical_theta(ns_s)
        uv_s = jnp.stack([phi / (2 * jnp.pi), theta / jnp.pi], axis=-1)
        dpdu_s = jnp.stack(
            [-ns_s[..., 1], ns_s[..., 0], jnp.zeros_like(phi)], axis=-1
        )
        dpdu_s = jnp.where(
            vm.squared_length(dpdu_s)[..., None] < 1e-12,
            vm.coordinate_system(ns_s)[0],
            dpdu_s,
        )
        m = sph_hit[..., None]
        ns = jnp.where(m, ns_s, ns_tri)
        ng = jnp.where(m, ns_s, ng_tri)
        uv = jnp.where(m, uv_s, uv_tri)
        dpdu = jnp.where(m, dpdu_s, dpdu_tri)
        mat = jnp.where(sph_hit, jnp.take(scene["sph_mat"], jnp.maximum(sph_id, 0)),
                        mat_tri)
        light = jnp.where(
            sph_hit, jnp.take(scene["sph_light"], jnp.maximum(sph_id, 0)), light_tri
        )
    else:
        ns, ng, uv, dpdu, mat, light = (
            ns_tri, ng_tri, uv_tri, dpdu_tri, mat_tri, light_tri
        )

    return {
        "hit": hit,
        "t": t,
        "p": p,
        "ns": ns,
        "ng": ng,
        "uv": uv,
        "dpdu": dpdu,
        "mat": jnp.where(hit, mat, 0),
        "light": jnp.where(hit, light, -1),
        "eps": HIT_EPS_SCALE * jnp.where(hit, t, 1.0),
        "wo": -d,
    }


def occluded(scene, meta: SceneMeta, o, d, mint, maxt):
    """Any-hit shadow query over triangles + spheres. Visibility is a
    discrete decision: inputs are detached so the traversal while_loop
    never sits on the differentiation path."""
    o, d, mint, maxt = (jax.lax.stop_gradient(v) for v in (o, d, mint, maxt))
    occ = trace_rays(
        jax.lax.stop_gradient(scene), meta, o, d, mint, maxt, any_hit=True
    ).hit
    if meta.n_spheres > 0:
        sph_id, _ = _sphere_pass(scene, o, d, mint, maxt)
        occ = occ | (sph_id >= 0)
    return occ
