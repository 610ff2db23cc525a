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


def test_packet_trace_ways2_matches_ways1():
    """Superscalar pop (ways=2) is estimator-exact vs ways=1."""
    p0, p1, p2, bvh, packed, o, d = _scene_and_rays(seed=9)
    mint = np.full(1024, 1e-4, np.float32)
    maxt = np.full(1024, 1e30, np.float32)
    args = (jnp.asarray(packed["nodes"]), jnp.asarray(packed["meta"]),
            jnp.asarray(packed["tris"]),
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint),
            jnp.asarray(maxt))
    a = trace_packets(*args, ways=1, interpret=True)
    b = trace_packets(*args, ways=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), rtol=1e-6)


def test_packet_trace_aligned_leaves():
    """8-aligned leaves + group extraction match the unaligned kernel."""
    from goblin_tpu.accel.bvh import align_leaves

    p0, p1, p2, bvh, packed, o, d = _scene_and_rays(seed=11)
    bvh_a = align_leaves(bvh, align=8)
    order = bvh_a.order
    sent = order < 0
    safe = np.where(sent, 0, order)
    soup = np.concatenate(
        [p0[safe], p1[safe] - p0[safe], p2[safe] - p0[safe]], axis=-1
    ).astype(np.float32)
    soup[sent] = 0.0
    packed_a = pack_scene(bvh_a.bounds, bvh_a.meta, soup)
    mint = np.full(1024, 1e-4, np.float32)
    maxt = np.full(1024, 1e30, np.float32)
    # max_leaf must be a multiple of 8 for the aligned kernel
    a = trace_packets(
        jnp.asarray(packed_a["nodes"]), jnp.asarray(packed_a["meta"]),
        jnp.asarray(packed_a["tris"]),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint),
        jnp.asarray(maxt), max_leaf=8, aligned=True, interpret=True,
    )
    b = trace_packets(
        jnp.asarray(packed["nodes"]), jnp.asarray(packed["meta"]),
        jnp.asarray(packed["tris"]),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint),
        jnp.asarray(maxt), max_leaf=4, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    ha = np.asarray(a[0])
    # same hit distances (tri ids are in different orderings)
    np.testing.assert_allclose(np.asarray(a[1])[ha], np.asarray(b[1])[ha],
                               rtol=1e-5)


def test_wide_kernel_parity_production_default():
    """ADVICE r4: the production-default traversal (collapse4 +
    trace_packets4 at widths 4 AND 8, aligned leaves, both any_hit
    settings, ways 1 and 2) had no committed test — only the binary
    kernel was covered. Interpret-mode parity vs the binary kernel."""
    from goblin_tpu.accel.bvh import align_leaves
    from goblin_tpu.ops.pallas_trace import collapse4, trace_packets4

    rng = np.random.default_rng(3)
    n_tri = 600
    p0 = (rng.uniform(-1, 1, (n_tri, 3)) * 3).astype(np.float32)
    p1 = p0 + rng.normal(size=(n_tri, 3)).astype(np.float32) * 0.4
    p2 = p0 + rng.normal(size=(n_tri, 3)).astype(np.float32) * 0.4
    bvh = build_bvh(p0, p1, p2, max_leaf=8)
    bvh = align_leaves(bvh, align=8)
    ordr = bvh.order
    safe = np.where(ordr < 0, 0, ordr)
    soup = np.concatenate(
        [p0[safe], p1[safe] - p0[safe], p2[safe] - p0[safe]], axis=-1
    ).astype(np.float32)
    soup[ordr < 0] = 0.0
    packed = pack_scene(bvh.bounds, bvh.meta, soup)
    n_rays = 1024
    o = (rng.uniform(-1, 1, (n_rays, 3)) * 6).astype(np.float32)
    tgt = rng.normal(size=(n_rays, 3)).astype(np.float32) * 1.5
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    mint = np.full(n_rays, 1e-4, np.float32)
    maxt = np.full(n_rays, 1e30, np.float32)
    ref_hit, ref_t, ref_tri, _, _ = trace_packets(
        jnp.asarray(packed["nodes"]), jnp.asarray(packed["meta"]),
        jnp.asarray(packed["tris"]),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint),
        jnp.asarray(maxt), max_leaf=8, aligned=True, interpret=True,
    )
    ref_hit, ref_t, ref_tri = (np.asarray(v) for v in
                               (ref_hit, ref_t, ref_tri))
    assert ref_hit.sum() > 100
    for width in (4, 8):
        nb4, nm4 = collapse4(bvh.bounds, bvh.meta, width=width)
        for ways in (1, 2):
            hit, t, tri, _, _ = trace_packets4(
                jnp.asarray(nb4), jnp.asarray(nm4),
                jnp.asarray(packed["tris"]),
                jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint),
                jnp.asarray(maxt), max_leaf=8, rows=8, width=width,
                ways=ways, interpret=True,
            )
            np.testing.assert_array_equal(np.asarray(hit), ref_hit,
                                          err_msg=f"w{width} ways{ways}")
            h = ref_hit
            np.testing.assert_allclose(np.asarray(t)[h], ref_t[h],
                                       rtol=1e-4)
            assert (np.asarray(tri)[h] == ref_tri[h]).mean() > 0.99
            # any-hit occlusion agrees with closest-hit's hit mask
            ahit, _, _, _, _ = trace_packets4(
                jnp.asarray(nb4), jnp.asarray(nm4),
                jnp.asarray(packed["tris"]),
                jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint),
                jnp.asarray(maxt), max_leaf=8, rows=8, width=width,
                ways=ways, any_hit=True, interpret=True,
            )
            np.testing.assert_array_equal(np.asarray(ahit), ref_hit)
