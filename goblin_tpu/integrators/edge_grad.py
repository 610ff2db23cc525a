"""Edge-sampled visibility gradients for area-light direct lighting.

The renderer's AD path differentiates every *smooth* term (BSDFs, light
radiance, geometry-dependent shading after the detached traversal —
scene/intersect.py), but the binary visibility V in the NEE integral is
a step function: moving an occluder changes WHICH light samples are
blocked, a boundary effect invisible to AD (SURVEY.md §7 "Hard parts
#2"; the reference has no differentiation support at all).

This module implements the missing boundary term by *edge sampling*
(the direct-lighting specialization of Li et al. 2018): for a shading
point p and an area light, the blocked region B on the light plane is
bounded by the projections of the occluder's silhouette edges from p.
Differentiating the area-form NEE integral

    L(p) = \\int_light g(y) V(y) dA,   g = f(p,y) Le cos_p cos_l / r^2

with respect to an occluder parameter th moves only the boundary:

    dL/dth = - \\oint_{dB} g(y(s)) (v(s) x T(s)) . n_l ds

where y(s) is the projection of edge point e(s), v = dy/dth (chain rule
through the projection, evaluated with jvp), T = dy/ds the boundary
tangent, and n_l the light plane normal; edges are oriented so the
projected silhouette polygon is counter-clockwise about n_l, making
(T x n_l) the outward normal times |T|.

Scope (documented): one occluder whose projected silhouette lies inside
the light polygon (no clipping against the light boundary), silhouette =
all edges for a single-triangle occluder. The estimator is validated
against finite differences of a dense numerical integration AND of the
production path tracer (tests/test_edge_grad.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import vecmath as vm


def _project_to_plane(p, e, plane_p, n_l):
    """Project e from center p onto the plane (plane_p, n_l)."""
    denom = vm.dot(e - p, n_l)
    tau = vm.dot(plane_p - p, n_l) / denom
    return p + tau[..., None] * (e - p)


def direct_light_boundary_grad(
    p, ns, albedo, light_p, n_l, Le, occ_tri, u_dir, n_samples: int = 64
):
    """Boundary term of d/dth L_direct(p) for an occluder translating
    along u_dir (th = signed distance along u_dir).

    p, ns: (3,) shading point and normal (Lambert albedo (3,)).
    light_p, n_l, Le: a point on the light plane, its normal, radiance.
    occ_tri: (3, 3) occluder triangle vertices.
    Returns (3,) dL/dth per channel.
    """
    q = jnp.asarray(occ_tri, jnp.float32)

    # orient the projected polygon CCW about n_l so (T x n_l) is outward
    y_v = _project_to_plane(
        jnp.broadcast_to(p, (3, 3)), q,
        jnp.broadcast_to(light_p, (3, 3)), jnp.broadcast_to(n_l, (3, 3)),
    )
    signed2 = vm.dot(jnp.cross(y_v[1] - y_v[0], y_v[2] - y_v[0]), n_l)
    flip = signed2 < 0.0

    def g_fn(y):
        """Integrand of the area-form NEE integral at light point y."""
        to_y = y - p
        r2 = jnp.maximum(vm.dot(to_y, to_y), 1e-12)
        w = to_y / jnp.sqrt(r2)
        cos_p = jnp.maximum(vm.dot(ns, w), 0.0)
        cos_l = jnp.maximum(vm.dot(n_l, -w), 0.0)
        return (albedo / jnp.pi) * Le * cos_p * cos_l / r2

    def edge_term(a, b):
        s = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) / n_samples

        def y_of(e):
            return _project_to_plane(p, e, light_p, n_l)

        e_pts = a[None, :] * (1.0 - s[:, None]) + b[None, :] * s[:, None]
        # dy/ds via the chain rule through the projection
        de_ds = jnp.broadcast_to(b - a, e_pts.shape)
        du = jnp.broadcast_to(jnp.asarray(u_dir, jnp.float32), e_pts.shape)
        y, T = jax.jvp(y_of, (e_pts,), (de_ds,))
        _, v = jax.jvp(y_of, (e_pts,), (du,))
        # outward-normal sweep rate: (v x T) . n_l  (CCW orientation)
        sweep = vm.dot(jnp.cross(v, T), jnp.broadcast_to(n_l, T.shape))
        g = jax.vmap(g_fn)(y)  # (S, 3)
        return -jnp.mean(sweep[:, None] * g, axis=0)  # ds integral (len 1)

    order = jnp.where(flip, jnp.asarray([0, 2, 1]), jnp.asarray([0, 1, 2]))
    qo = q[order]
    total = (
        edge_term(qo[0], qo[1])
        + edge_term(qo[1], qo[2])
        + edge_term(qo[2], qo[0])
    )
    return total
