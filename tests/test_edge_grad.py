"""Edge-sampled visibility gradients (integrators/edge_grad.py) vs
finite differences — the boundary term AD cannot see (BASELINE.md
"vertex params" row; SURVEY.md §7 hard part #2)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from goblin_tpu.integrators.edge_grad import direct_light_boundary_grad

# toy configuration: downward-facing quad light, diffuse receiver at the
# origin, small occluder triangle between them whose projected shadow
# stays inside the light
P = np.float32([0.0, 0.0, 0.0])
NS = np.float32([0.0, 1.0, 0.0])
ALBEDO = np.float32([0.8, 0.6, 0.4])
LIGHT_P = np.float32([0.0, 2.0, 0.0])  # plane y = 2
N_L = np.float32([0.0, -1.0, 0.0])
LE = np.float32([5.0, 5.0, 5.0])
HALF = 1.0  # light spans [-1,1]^2 at y=2


def _occ(theta):
    base = np.float32([
        [0.10 + theta, 1.0, 0.05],
        [0.28 + theta, 1.0, 0.12],
        [0.16 + theta, 1.0, -0.16],
    ])
    return base


def _moller(o, d, v0, v1, v2):
    e1 = v1 - v0
    e2 = v2 - v0
    pv = np.cross(d, e2)
    det = (e1 * pv).sum(-1)
    inv = 1.0 / np.where(np.abs(det) < 1e-12, 1.0, det)
    tv = o - v0
    b1 = (tv * pv).sum(-1) * inv
    qv = np.cross(tv, e1)
    b2 = (d * qv).sum(-1) * inv
    t = (e2 * qv).sum(-1) * inv
    return (np.abs(det) > 1e-12) & (b1 >= 0) & (b2 >= 0) & (b1 + b2 <= 1) \
        & (t > 1e-4) & (t < 1 - 1e-4)


def _g(y):
    to_y = y - P
    r2 = (to_y ** 2).sum(-1)
    w = to_y / np.sqrt(r2)[:, None]
    cos_p = np.maximum(w @ NS, 0.0)
    cos_l = np.maximum((-w) @ N_L, 0.0)
    return (ALBEDO[None, :] / np.pi) * LE[None, :] * (
        cos_p * cos_l / r2
    )[:, None]


def _proj_tri(theta):
    q = _occ(theta)
    out = []
    for v in q:
        tau = np.dot(LIGHT_P - P, N_L) / np.dot(v - P, N_L)
        out.append(P + tau * (v - P))
    return np.asarray(out)


def _int_blocked(theta, n=800):
    """Exact-region integration of g over the blocked area B (= the
    projected occluder triangle; it lies inside the light, so
    L(theta) = L_unoccluded - this)."""
    tri = _proj_tri(theta)
    u = (np.arange(n) + 0.5) / n
    U, V = np.meshgrid(u, u)
    m = (U + V) < 1
    pts = tri[0] + U[..., None] * (tri[1] - tri[0]) \
        + V[..., None] * (tri[2] - tri[0])
    area = 0.5 * np.linalg.norm(np.cross(tri[1] - tri[0], tri[2] - tri[0]))
    vals = _g(pts.reshape(-1, 3)).reshape(n, n, 3)
    return vals[m].mean(axis=0) * area


def test_boundary_grad_matches_dense_fd():
    """FD of the exact blocked-region integral: dL/dth = -d/dth int_B g.

    (A naive FD over a light-plane GRID with binary visibility aliases
    badly — the boundary moves by less than a grid cell — so the region
    integral is the honest oracle.)"""
    h = 2e-3
    fd = -(_int_blocked(h) - _int_blocked(-h)) / (2 * h)
    est = np.asarray(direct_light_boundary_grad(
        jnp.asarray(P), jnp.asarray(NS), jnp.asarray(ALBEDO),
        jnp.asarray(LIGHT_P), jnp.asarray(N_L), jnp.asarray(LE),
        jnp.asarray(_occ(0.0)), jnp.asarray([1.0, 0.0, 0.0]),
        n_samples=128,
    ))
    assert np.all(np.abs(fd) > 1e-4)  # the boundary term is nonzero
    np.testing.assert_allclose(est, fd, rtol=0.02)


def test_boundary_grad_orientation_flip():
    """Vertex order must not change the result (orientation handling)."""
    tri = _occ(0.0)
    a = np.asarray(direct_light_boundary_grad(
        jnp.asarray(P), jnp.asarray(NS), jnp.asarray(ALBEDO),
        jnp.asarray(LIGHT_P), jnp.asarray(N_L), jnp.asarray(LE),
        jnp.asarray(tri), jnp.asarray([1.0, 0.0, 0.0]), n_samples=64,
    ))
    b = np.asarray(direct_light_boundary_grad(
        jnp.asarray(P), jnp.asarray(NS), jnp.asarray(ALBEDO),
        jnp.asarray(LIGHT_P), jnp.asarray(N_L), jnp.asarray(LE),
        jnp.asarray(tri[::-1].copy()), jnp.asarray([1.0, 0.0, 0.0]),
        n_samples=64,
    ))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_boundary_location_matches_renderer_occlusion(tmp_path):
    """Couple the estimator to the production renderer: the boundary it
    integrates along (the projected silhouette edges) must be exactly
    where the renderer's occluded() flips. Points just inside the
    projected triangle are occluded, just outside are lit.

    (A pixel-level FD of the renderer is hopeless: the per-pixel
    boundary signal is ~0.007 while spp=256 Monte-Carlo FD noise is
    ~0.5 — the dense-region FD in test_boundary_grad_matches_dense_fd
    is the numeric validation of the gradient value itself.)"""
    _renderer_boundary_check(tmp_path)


def _renderer_boundary_check(tmp_path):
    from goblin_tpu.integrators import common
    from goblin_tpu.integrators.path import make_li
    from goblin_tpu.scene.loader import load_scene

    def scene_doc(theta):
        tri = _occ(theta)
        # occluder OBJ
        obj = "".join(
            f"v {v[0]} {v[1]} {v[2]}\n" for v in tri
        ) + "vn 0 1 0\nf 1//1 2//1 3//1\n"
        with open(os.path.join(str(tmp_path), "occ.obj"), "w") as f:
            f.write(obj)
        # light quad (y=2, facing down via euler 180)
        with open(os.path.join(str(tmp_path), "quad.obj"), "w") as f:
            f.write(
                "v -1 0 1\nv 1 0 1\nv -1 0 -1\nv 1 0 -1\n"
                "vn 0 1 0\nf 1//1 2//1 3//1\nf 3//1 2//1 4//1\n"
            )
        # receiver floor
        with open(os.path.join(str(tmp_path), "floor.obj"), "w") as f:
            f.write(
                "v -1 0 1\nv 1 0 1\nv -1 0 -1\nv 1 0 -1\n"
                "vn 0 1 0\nf 1//1 2//1 3//1\nf 3//1 2//1 4//1\n"
            )
        doc = {
            "render_setting": {"render_method": "path_tracing",
                               "sample_per_pixel": 1, "max_ray_depth": 2},
            # frame ONLY the floor: the occluder (y=1) must stay outside
            # the frustum — its moving image silhouette is a primary-
            # visibility boundary this estimator deliberately excludes
            "camera": {
                "position": [0.1, 0.45, -0.55], "euler": [40, 0, 0],
                "rotation_order": "xyz", "fov": 45.0,
                "film": {"resolution": [12, 12]},
                "filter": {"type": "box", "width": [0.5, 0.5]},
            },
            "geometries": [
                {"name": "floor", "type": "mesh", "file": "floor.obj"},
                {"name": "quad", "type": "mesh", "file": "quad.obj"},
                {"name": "occ", "type": "mesh", "file": "occ.obj"},
            ],
            "textures": [
                {"format": "color", "name": "alb", "type": "constant",
                 "color": [float(v) for v in ALBEDO]},
                {"format": "color", "name": "dark", "type": "constant",
                 "color": [0.0, 0.0, 0.0]},
            ],
            "materials": [
                {"name": "recv", "type": "lambert", "Kd": "alb"},
                {"name": "blk", "type": "lambert", "Kd": "dark"},
            ],
            "primitives": [
                {"type": "model", "name": "fm", "geometry": "floor",
                 "material": "recv"},
                {"type": "instance", "name": "fi", "model": "fm",
                 "scale": [0.5, 0.5, 0.5]},
                {"type": "model", "name": "om", "geometry": "occ",
                 "material": "blk"},
                {"type": "instance", "name": "oi", "model": "om"},
            ],
            "lights": [{
                "name": "panel", "type": "area",
                "radiance": [float(v) for v in LE],
                "geometry": "quad", "position": [0.0, 2.0, 0.0],
                "euler": [180.0, 0.0, 0.0],
            }],
        }
        pth = os.path.join(str(tmp_path), "scene.json")
        json.dump(doc, open(pth, "w"))
        return pth

    scene, meta = load_scene(scene_doc(0.0))
    from goblin_tpu.scene import intersect as scn

    # shading point: a floor point under the shadow
    p0 = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    tri_y = _proj_tri(0.0)  # projected silhouette on the light plane
    eps_in = 0.01
    centroid = tri_y.mean(axis=0)
    for a, b in ((0, 1), (1, 2), (2, 0)):
        mids = 0.5 * (tri_y[a] + tri_y[b])
        inward = centroid - mids
        inward = inward / np.linalg.norm(inward)
        for sgn, expect in ((+1.0, True), (-1.0, False)):
            y = mids + sgn * eps_in * inward
            d = jnp.asarray((y - np.asarray(p0[0]))[None, :], jnp.float32)
            dist = float(np.linalg.norm(y - np.asarray(p0[0])))
            occ = scn.occluded(
                scene, meta, p0, d / dist,
                jnp.asarray([1e-3]), jnp.asarray([dist - 1e-3]),
            )
            assert bool(occ[0]) == expect, (a, b, sgn)


# ---------------------------------------------------------------------------
# Mesh occluder (round 5): silhouette extraction + light-polygon clipping
# ---------------------------------------------------------------------------


def _tet(theta):
    """Closed tetrahedron occluder translated along +x by theta, sized
    and placed so part of its projected silhouette falls OUTSIDE the
    light polygon (exercises the clip)."""
    # base at y=1 projects x2 onto the light plane: x spans
    # [0.3, 1.1] + 2*theta — straddles the +x light edge at x = 1
    v = np.float32([
        [0.15 + theta, 1.0, 0.00],
        [0.55 + theta, 1.0, 0.25],
        [0.40 + theta, 1.0, -0.30],
        [0.35 + theta, 1.25, 0.00],
    ])
    f = np.int32([[0, 2, 1], [0, 1, 3], [1, 2, 3], [2, 0, 3]])
    return v, f


def _L_direct_mesh(theta, n_grid=400):
    """Dense-quadrature direct lighting with the tet occluder."""
    v, f = _tet(theta)
    xs = (np.arange(n_grid) + 0.5) / n_grid * 2 * HALF - HALF
    zs = xs.copy()
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    y = np.stack([X.ravel(), np.full(X.size, 2.0), Z.ravel()], -1)
    d = y - P[None, :]
    occ = np.zeros(y.shape[0], bool)
    for tri in f:
        occ |= _moller(np.broadcast_to(P, y.shape), d,
                       np.broadcast_to(v[tri[0]], y.shape),
                       np.broadcast_to(v[tri[1]], y.shape),
                       np.broadcast_to(v[tri[2]], y.shape))
    g = _g(y)
    area = (2 * HALF) ** 2
    return (g * (~occ)[:, None]).mean(axis=0) * area


def test_mesh_boundary_grad_vs_fd_with_clipping():
    from goblin_tpu.integrators.edge_grad import (
        build_edge_adjacency,
        mesh_boundary_grad,
    )

    light_poly = np.float32([
        [-HALF, 2.0, -HALF], [HALF, 2.0, -HALF],
        [HALF, 2.0, HALF], [-HALF, 2.0, HALF],
    ])
    # CCW about n_l = (0,-1,0): check orientation sign once
    e1 = light_poly[1] - light_poly[0]
    e2 = light_poly[2] - light_poly[1]
    if np.dot(np.cross(e1, e2), N_L) < 0:
        light_poly = light_poly[::-1].copy()

    # sweep: the tet shadow starts inside and crosses the +x light edge
    for theta in (-0.05, 0.0, 0.12, 0.3):
        v, f = _tet(theta)
        adj = build_edge_adjacency(f)
        vel = np.tile(np.float32([1.0, 0.0, 0.0]), (v.shape[0], 1))
        grad = np.asarray(mesh_boundary_grad(
            jnp.asarray(P), jnp.asarray(NS), jnp.asarray(ALBEDO),
            light_poly, jnp.asarray(N_L), jnp.asarray(LE),
            v, f, adj, vel, n_samples=128,
        ))
        h = 5e-3
        fd = (_L_direct_mesh(theta + h) - _L_direct_mesh(theta - h)) / (2 * h)
        scale = max(np.abs(fd).max(), 1e-4)
        err = np.abs(grad - fd).max() / scale
        assert err < 0.08, (theta, grad, fd)


def test_mesh_boundary_grad_zero_when_shadow_outside():
    """Shadow entirely off the light -> boundary gradient ~ 0 (the clip
    must reject every edge)."""
    from goblin_tpu.integrators.edge_grad import (
        build_edge_adjacency,
        mesh_boundary_grad,
    )

    light_poly = np.float32([
        [-HALF, 2.0, -HALF], [HALF, 2.0, -HALF],
        [HALF, 2.0, HALF], [-HALF, 2.0, HALF],
    ])
    e1 = light_poly[1] - light_poly[0]
    e2 = light_poly[2] - light_poly[1]
    if np.dot(np.cross(e1, e2), N_L) < 0:
        light_poly = light_poly[::-1].copy()
    v, f = _tet(3.0)  # far off the light
    adj = build_edge_adjacency(f)
    vel = np.tile(np.float32([1.0, 0.0, 0.0]), (v.shape[0], 1))
    grad = np.asarray(mesh_boundary_grad(
        jnp.asarray(P), jnp.asarray(NS), jnp.asarray(ALBEDO),
        light_poly, jnp.asarray(N_L), jnp.asarray(LE),
        v, f, adj, vel, n_samples=32,
    ))
    assert np.abs(grad).max() < 1e-5, grad
