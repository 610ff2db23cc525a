"""Packet-BVH Pallas kernel vs brute force (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from goblin_tpu.accel.bvh import build_bvh
from goblin_tpu.geometry import intersect as isect
from goblin_tpu.ops.pallas_trace import pack_scene, trace_packets


def _scene_and_rays(n_tri=600, n_rays=1024, seed=0):
    rng = np.random.default_rng(seed)
    p0 = (rng.uniform(-1, 1, (n_tri, 3)) * 3).astype(np.float32)
    p1 = p0 + rng.normal(size=(n_tri, 3)).astype(np.float32) * 0.4
    p2 = p0 + rng.normal(size=(n_tri, 3)).astype(np.float32) * 0.4
    bvh = build_bvh(p0, p1, p2)
    ordr = bvh.order
    soup = np.concatenate(
        [p0[ordr], p1[ordr] - p0[ordr], p2[ordr] - p0[ordr]], axis=-1
    ).astype(np.float32)
    packed = pack_scene(bvh.bounds, bvh.meta, soup)
    o = (rng.uniform(-1, 1, (n_rays, 3)) * 6).astype(np.float32)
    tgt = rng.normal(size=(n_rays, 3)).astype(np.float32) * 1.5
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return p0, p1, p2, bvh, packed, o, d


def test_packet_trace_matches_brute_force():
    p0, p1, p2, bvh, packed, o, d = _scene_and_rays()
    mint = np.full(1024, 1e-4, np.float32)
    maxt = np.full(1024, 1e30, np.float32)
    hit, t, tri, b1, b2 = trace_packets(
        jnp.asarray(packed["nodes"]), jnp.asarray(packed["meta"]),
        jnp.asarray(packed["tris"]),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint), jnp.asarray(maxt),
        interpret=True,
    )
    bf_hit, bf_t, bf_tri, _, _ = isect.brute_force_closest(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(p0), jnp.asarray(p1 - p0), jnp.asarray(p2 - p0),
        jnp.asarray(mint), jnp.asarray(maxt),
    )
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(bf_hit))
    h = np.asarray(bf_hit)
    assert h.sum() > 100
    np.testing.assert_allclose(np.asarray(t)[h], np.asarray(bf_t)[h],
                               rtol=1e-4)
    # triangle agreement via order remap (ties aside)
    remap = bvh.order[np.asarray(tri)[h]]
    assert (remap == np.asarray(bf_tri)[h]).mean() > 0.99


def test_packet_trace_any_hit():
    p0, p1, p2, bvh, packed, o, d = _scene_and_rays(seed=5)
    mint = np.full(1024, 1e-4, np.float32)
    maxt = np.full(1024, 4.0, np.float32)
    hit, _, _, _, _ = trace_packets(
        jnp.asarray(packed["nodes"]), jnp.asarray(packed["meta"]),
        jnp.asarray(packed["tris"]),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint), jnp.asarray(maxt),
        any_hit=True, interpret=True,
    )
    bf = isect.brute_force_occluded(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(p0), jnp.asarray(p1 - p0), jnp.asarray(p2 - p0),
        jnp.asarray(mint), jnp.asarray(maxt),
    )
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(bf))
