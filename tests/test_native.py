"""Native library parity: C++ BVH/OBJ vs the pure-python fallbacks."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from goblin_tpu import native
from goblin_tpu.accel.bvh import _build_bvh_python, build_bvh
from goblin_tpu.accel.traverse import pack_tri_soup, trace
from goblin_tpu.geometry import intersect as isect
from goblin_tpu.geometry.mesh import _load_obj_python, load_obj, make_sphere_mesh, write_obj

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _soup(n, seed=0):
    rng = np.random.default_rng(seed)
    p0 = (rng.uniform(-1, 1, (n, 3)) * 3).astype(np.float32)
    p1 = p0 + rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    p2 = p0 + rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    return p0, p1, p2


def test_native_bvh_matches_brute_force():
    p0, p1, p2 = _soup(800, 3)
    bvh = build_bvh(p0, p1, p2)  # native path
    assert bvh.num_nodes > 1
    rng = np.random.default_rng(9)
    o = (rng.uniform(-1, 1, (256, 3)) * 6).astype(np.float32)
    tgt = rng.normal(size=(256, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    soup = pack_tri_soup(
        jnp.asarray(p0[bvh.order]), jnp.asarray(p1[bvh.order]),
        jnp.asarray(p2[bvh.order]),
    )
    mint = jnp.zeros(256) + 1e-4
    maxt = jnp.full(256, 1e30)
    res = trace(jnp.asarray(bvh.bounds), jnp.asarray(bvh.meta), soup,
                jnp.asarray(o), jnp.asarray(d), mint, maxt)
    bf_hit, bf_t, _, _, _ = isect.brute_force_closest(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(p0), jnp.asarray(p1 - p0), jnp.asarray(p2 - p0),
        mint, maxt,
    )
    np.testing.assert_array_equal(np.asarray(res.hit), np.asarray(bf_hit))
    h = np.asarray(bf_hit)
    np.testing.assert_allclose(np.asarray(res.t)[h], np.asarray(bf_t)[h],
                               rtol=1e-4)


def test_native_bvh_structure_valid():
    p0, p1, p2 = _soup(500, 1)
    bvh = build_bvh(p0, p1, p2)
    meta = bvh.meta
    n = bvh.num_nodes
    # miss links strictly increase past each node, leaves cover all tris
    assert (meta[:, 2] > np.arange(n)).all()
    assert meta[:, 2].max() == n
    leaf = meta[meta[:, 1] > 0]
    covered = np.concatenate([np.arange(f, f + c) for f, c in leaf[:, :2]])
    assert sorted(covered.tolist()) == list(range(500))
    assert sorted(bvh.order.tolist()) == list(range(500))


def test_native_obj_matches_python(tmp_path):
    mesh = make_sphere_mesh(1.0, 8, 16)
    p = os.path.join(tmp_path, "s.obj")
    write_obj(p, mesh)
    a = load_obj(p)  # native
    b = _load_obj_python(p)
    assert a.num_faces == b.num_faces
    np.testing.assert_allclose(a.positions[a.faces], b.positions[b.faces],
                               atol=1e-5)
    np.testing.assert_allclose(a.normals[a.faces], b.normals[b.faces],
                               atol=1e-5)


def test_native_obj_formats(tmp_path):
    content = (
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvn 0 0 1\n"
        "f 1 2 3\nf 1/1 2/2 3/3\nf 1//1 2//1 3//1\n"
        "f -4/-3/-1 -3/-2/-1 -2/-1/-1\nf 1 2 3 4\n"
    )
    p = os.path.join(tmp_path, "t.obj")
    with open(p, "w") as f:
        f.write(content)
    mesh = load_obj(p)
    assert mesh.num_faces == 6
    assert mesh.has_normals and mesh.has_uvs


def test_native_morton_order():
    p0, p1, p2 = _soup(300, 2)
    codes, order = native.morton_order(p0, p1, p2)
    assert sorted(order.tolist()) == list(range(300))
    assert (np.diff(codes[order].astype(np.int64)) >= 0).all()
