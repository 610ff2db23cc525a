import jax.numpy as jnp
import numpy as np
import pytest

from goblin_tpu.accel.bvh import build_bvh
from goblin_tpu.accel.traverse import occluded, pack_tri_soup, trace
from goblin_tpu.geometry import intersect as isect
from goblin_tpu.geometry.mesh import make_sphere_mesh


def _random_soup(n_tri, seed=0, spread=3.0, size=0.4):
    rng = np.random.default_rng(seed)
    p0 = (rng.uniform(-1, 1, size=(n_tri, 3)) * spread).astype(np.float32)
    p1 = p0 + (rng.normal(size=(n_tri, 3)) * size).astype(np.float32)
    p2 = p0 + (rng.normal(size=(n_tri, 3)) * size).astype(np.float32)
    return p0, p1, p2


def _random_rays(n, seed=1, spread=6.0):
    rng = np.random.default_rng(seed)
    o = (rng.uniform(-1, 1, size=(n, 3)) * spread).astype(np.float32)
    # aim toward jittered points near the origin so most rays cross the
    # triangle cloud
    target = rng.normal(size=(n, 3)).astype(np.float32) * 1.5
    d = (target - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.mark.parametrize("n_tri,seed", [(37, 0), (256, 7), (1000, 42)])
def test_bvh_matches_brute_force(n_tri, seed):
    p0, p1, p2 = _random_soup(n_tri, seed)
    bvh = build_bvh(p0, p1, p2)
    # reorder soup per BVH
    o_, d_ = _random_rays(512, seed + 1)
    ord = bvh.order
    soup = pack_tri_soup(
        jnp.asarray(p0[ord]), jnp.asarray(p1[ord]), jnp.asarray(p2[ord])
    )
    mint = jnp.zeros(512) + 1e-4
    maxt = jnp.full(512, 1e30)
    res = trace(
        jnp.asarray(bvh.bounds), jnp.asarray(bvh.meta), soup,
        jnp.asarray(o_), jnp.asarray(d_), mint, maxt,
    )
    bf_hit, bf_t, bf_tri, _, _ = isect.brute_force_closest(
        jnp.asarray(o_), jnp.asarray(d_),
        jnp.asarray(p0), jnp.asarray(p1 - p0), jnp.asarray(p2 - p0),
        mint, maxt,
    )
    np.testing.assert_array_equal(np.asarray(res.hit), np.asarray(bf_hit))
    h = np.asarray(bf_hit)
    assert h.sum() > 20
    np.testing.assert_allclose(np.asarray(res.t)[h], np.asarray(bf_t)[h], rtol=1e-4)
    # the hit triangle (via order remap) must match brute force except for
    # exact-tie t values
    remap = ord[np.asarray(res.tri)]
    agree = remap[h] == np.asarray(bf_tri)[h]
    assert agree.mean() > 0.99


def test_bvh_occluded_matches_brute_force():
    p0, p1, p2 = _random_soup(300, 3)
    bvh = build_bvh(p0, p1, p2)
    o_, d_ = _random_rays(400, 5)
    ord = bvh.order
    soup = pack_tri_soup(
        jnp.asarray(p0[ord]), jnp.asarray(p1[ord]), jnp.asarray(p2[ord])
    )
    mint = jnp.zeros(400) + 1e-4
    maxt = jnp.full(400, 4.0)  # finite shadow-ray style segment
    occ = occluded(
        jnp.asarray(bvh.bounds), jnp.asarray(bvh.meta), soup,
        jnp.asarray(o_), jnp.asarray(d_), mint, maxt,
    )
    bf = isect.brute_force_occluded(
        jnp.asarray(o_), jnp.asarray(d_),
        jnp.asarray(p0), jnp.asarray(p1 - p0), jnp.asarray(p2 - p0),
        mint, maxt,
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(bf))


def test_bvh_on_sphere_mesh_watertight():
    mesh = make_sphere_mesh(1.0, 16, 32)
    p = mesh.positions[mesh.faces]
    bvh = build_bvh(p[:, 0], p[:, 1], p[:, 2])
    ord = bvh.order
    soup = pack_tri_soup(
        jnp.asarray(p[ord, 0]), jnp.asarray(p[ord, 1]), jnp.asarray(p[ord, 2])
    )
    # rays from outside aimed at the center must all hit ~the unit sphere
    o_, d_ = _random_rays(256, 11)
    o_ = o_ / np.linalg.norm(o_, axis=-1, keepdims=True) * 5.0
    d_ = -o_ / 5.0
    res = trace(
        jnp.asarray(bvh.bounds), jnp.asarray(bvh.meta), soup,
        jnp.asarray(o_), jnp.asarray(d_),
        jnp.zeros(256), jnp.full(256, 1e30),
    )
    assert np.asarray(res.hit).all()
    np.testing.assert_allclose(np.asarray(res.t), 4.0, atol=0.05)


def test_bvh_single_triangle_and_leaf_sizes():
    p0 = np.array([[0.0, 0.0, 0.0]], dtype=np.float32)
    p1 = np.array([[1.0, 0.0, 0.0]], dtype=np.float32)
    p2 = np.array([[0.0, 1.0, 0.0]], dtype=np.float32)
    bvh = build_bvh(p0, p1, p2)
    assert bvh.num_nodes == 1
    soup = pack_tri_soup(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))
    res = trace(
        jnp.asarray(bvh.bounds), jnp.asarray(bvh.meta), soup,
        jnp.array([[0.2, 0.2, -1.0]]), jnp.array([[0.0, 0.0, 1.0]]),
        jnp.zeros(1), jnp.full(1, 1e30),
    )
    assert bool(res.hit[0])
    np.testing.assert_allclose(float(res.t[0]), 1.0, rtol=1e-6)
