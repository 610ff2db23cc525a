"""Pallas TPU packet-BVH traversal kernel.

Why this shape: on TPU, per-lane gathers are pathologically slow (~ms per
call — measured) and XLA's gather lowering is the bottleneck of the pure
jnp traversal (accel/traverse.py). The classic answer is *packet
traversal*: a block of rays shares ONE scalar traversal stack; node
fetches become scalar-indexed dynamic slices from VMEM-resident packed
scene arrays (fast), AABB/triangle tests are dense vector ops over the
whole packet, and control flow is scalar (`lax.while_loop` + `lax.cond`)
— exactly the mix the TPU core is built for.

Memory layout (lane-aligned packing, VMEM):
- nodes:  (ceil(N/16), 128) f32 — node j at group j//16, lanes
          (j%16)*8 .. +5: [bmin.xyz, bmax.xyz, pad, pad]
- meta:   (ceil(N/32), 128) i32 — node j at group j//32, lanes
          (j%32)*4 .. +2: [first_tri, tri_count (0 = inner), miss]
          (for inner nodes the right child = meta[left=j+1].miss,
          left child = j+1 — DFS pre-order invariant)
- tris:   (ceil(T/8), 128) f32 — triangle k at group k//8, lanes
          (k%8)*12 .. +8: [v0.xyz, e1.xyz, e2.xyz, pad x3]

Rays are reshaped (R,) -> (P, 8, 128) per component (1024-ray packets).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACKET = 1024  # rays per packet: (8, 128) f32 tile
STACK_DEPTH = 96
BIG_T = 3.0e38
MAX_LEAF_PAD = 64  # largest max_leaf the triangle padding supports


def pack_scene(bounds: np.ndarray, meta: np.ndarray, tri_soup: np.ndarray):
    """Host-side packing of BVH + triangle soup into lane-aligned arrays.

    bounds: (N, 6) f32; meta: (N, 3) i32; tri_soup: (T, 9) f32 (BVH order).
    Returns dict of numpy arrays.
    """
    N = bounds.shape[0]
    T = tri_soup.shape[0]
    ng = (N + 15) // 16
    nodes_packed = np.zeros((ng, 128), np.float32)
    flat = nodes_packed.reshape(ng * 16, 8)
    flat[:N, 0:6] = bounds
    mg = (N + 31) // 32
    meta_packed = np.zeros((mg, 128), np.int32)
    mflat = meta_packed.reshape(mg * 32, 4)
    mflat[:N, 0:3] = meta
    # inner nodes don't use the first-triangle field: bake the RIGHT
    # child index (= miss link of the left child j+1) into it so the
    # kernel resolves both children from ONE meta fetch (each one-hot
    # extract ends in a vector->scalar reduction — the latency the
    # traversal is bound by)
    inner = meta[:, 1] == 0
    left = np.arange(N) + 1
    right = np.where(left < N, meta[np.minimum(left, N - 1), 2], 0)
    mflat[:N, 0] = np.where(inner, right, meta[:, 0])
    # pad groups: leaf loops read first+k for k < max_leaf unconditionally
    # (misses masked by k<count), so the last leaf can index up to
    # T + MAX_LEAF_PAD - 2 — pad enough groups for max_leaf <= MAX_LEAF_PAD
    tg = (T + 7) // 8 + (MAX_LEAF_PAD + 7) // 8
    tris_packed = np.zeros((tg, 128), np.float32)
    tflat = tris_packed.reshape(tg * 8, 16)
    tflat[:T, 0:9] = tri_soup
    return {
        "nodes": nodes_packed,
        "meta": meta_packed,
        "tris": tris_packed,
        "n_nodes": N,
        "n_tris": T,
    }


def _extract(row, off, k):
    """Scalar lane-extract row[0, off+k] from a (1, 128) vector."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    return jnp.sum(jnp.where(lane == off + k, row, 0.0))


def _extract_i(row, off, k):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    return jnp.sum(jnp.where(lane == off + k, row, 0))


def _extract_block(row, off, n_sub: int):
    """Lanes off..off+n_sub-1 of a (1, 128) row as an (n_sub, 1) vector
    in ONE cross-lane reduction (each _extract sum is a vector->scalar
    sync; batching the components into the sublane axis replaces N
    reductions with one, and the per-component reads afterwards are
    static sublane extracts)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_sub, 128), 1)
    comp = jax.lax.broadcasted_iota(jnp.int32, (n_sub, 128), 0)
    mask = lane == off + comp
    return jnp.sum(jnp.where(mask, row, jnp.zeros_like(row)), axis=1,
                   keepdims=True)


# (measured dead end: broadcasting the components across lanes with two
# MXU products instead of extracting scalars — outer-product splat then
# one-hot selector matmul — halved throughput AND corrupted values: TPU
# f32 dots round operands through bf16 unless Precision.HIGHEST, which
# triples the MXU passes. The batched one-reduction extract above is the
# fastest correct formulation found.)


def _make_kernel(max_leaf: int, any_hit: bool, rows: int = 8,
                 ways: int = 1, aligned: bool = False):
    assert not aligned or max_leaf % 8 == 0, \
        "aligned leaf extraction needs max_leaf % 8 == 0"
    def kernel(nodes_ref, meta_ref, tris_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               mint_ref, maxt_ref,
               t_ref, tri_ref, b1_ref, b2_ref,
               stack_ref, tn_stack_ref):
        ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
        dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
        mint = mint_ref[0]
        maxt = maxt_ref[0]
        tiny = 1e-30
        inv_dx = 1.0 / jnp.where(dx == 0.0, tiny, dx)
        inv_dy = 1.0 / jnp.where(dy == 0.0, tiny, dy)
        inv_dz = 1.0 / jnp.where(dz == 0.0, tiny, dz)

        stack_ref[0] = 0  # root
        tn_stack_ref[0] = -BIG_T  # never culled

        def fetch_meta(j):
            mrow = meta_ref[pl.ds(j // 32, 1), :]
            moff = (j % 32) * 4
            m = _extract_block(mrow, moff, 4)
            return m[0, 0], m[1, 0], m[2, 0]

        def tri_test(tv, tri_id, k, count, t_best, tri_best, b1_best,
                     b2_best):
            v0x, v0y, v0z = tv(0), tv(1), tv(2)
            e1x, e1y, e1z = tv(3), tv(4), tv(5)
            e2x, e2y, e2z = tv(6), tv(7), tv(8)
            # Moller-Trumbore, scalar triangle x vector rays
            s1x = dy * e2z - dz * e2y
            s1y = dz * e2x - dx * e2z
            s1z = dx * e2y - dy * e2x
            div = s1x * e1x + s1y * e1y + s1z * e1z
            inv = 1.0 / jnp.where(div == 0.0, tiny, div)
            sx = ox - v0x
            sy = oy - v0y
            sz = oz - v0z
            b1 = (sx * s1x + sy * s1y + sz * s1z) * inv
            s2x = sy * e1z - sz * e1y
            s2y = sz * e1x - sx * e1z
            s2z = sx * e1y - sy * e1x
            b2 = (dx * s2x + dy * s2y + dz * s2z) * inv
            t = (e2x * s2x + e2y * s2y + e2z * s2z) * inv
            eps = 1e-7
            hit = (
                (div != 0.0)
                & (b1 + eps >= 0.0) & (b1 - eps <= 1.0)
                & (b2 + eps >= 0.0) & (b1 + b2 - eps <= 1.0)
                & (t >= mint) & (t <= t_best)
                & (k < count)
            )
            t_best = jnp.where(hit, t, t_best)
            tri_best = jnp.where(hit, tri_id, tri_best)
            b1_best = jnp.where(hit, b1, b1_best)
            b2_best = jnp.where(hit, b2, b2_best)
            return t_best, tri_best, b1_best, b2_best

        def leaf_tris_aligned(first, count, t_best, tri_best, b1_best,
                              b2_best):
            """first is 8-aligned (accel.bvh.align_leaves): extract each
            8-triangle group's full 128-lane row with ONE reduction and
            read components at static sublane offsets."""
            g0 = first // 8
            for gk in range(max_leaf // 8):
                grow = tris_ref[pl.ds(g0 + gk, 1), :]
                blk = _extract_block(grow, 0, 128)  # (128, 1)
                for k8 in range(8):
                    k = gk * 8 + k8
                    toff = k8 * 16

                    def tv(i, _toff=toff):
                        return blk[_toff + i, 0]

                    t_best, tri_best, b1_best, b2_best = tri_test(
                        tv, first + k, k, count, t_best, tri_best,
                        b1_best, b2_best,
                    )
            return t_best, tri_best, b1_best, b2_best

        def leaf_tris(first, count, t_best, tri_best, b1_best, b2_best):
            if aligned:
                return leaf_tris_aligned(first, count, t_best, tri_best,
                                         b1_best, b2_best)
            for k in range(max_leaf):
                tri_id = first + k
                trow = tris_ref[pl.ds(tri_id // 8, 1), :]
                toff = (tri_id % 8) * 16

                tvv = _extract_block(trow, toff, 16)

                def tv(i):
                    return tvv[i, 0]

                t_best, tri_best, b1_best, b2_best = tri_test(
                    tv, tri_id, k, count, t_best, tri_best, b1_best,
                    b2_best,
                )
            return t_best, tri_best, b1_best, b2_best

        def box_test(j, t_best):
            """AABB of node j vs the packet. Returns (hit_any, tn masked)."""
            nrow = nodes_ref[pl.ds(j // 16, 1), :]
            noff = (j % 16) * 8
            bb = _extract_block(nrow, noff, 8)
            bminx, bminy, bminz = bb[0, 0], bb[1, 0], bb[2, 0]
            bmaxx, bmaxy, bmaxz = bb[3, 0], bb[4, 0], bb[5, 0]
            t0x = (bminx - ox) * inv_dx
            t1x = (bmaxx - ox) * inv_dx
            t0y = (bminy - oy) * inv_dy
            t1y = (bmaxy - oy) * inv_dy
            t0z = (bminz - oz) * inv_dz
            t1z = (bmaxz - oz) * inv_dz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), mint),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), t_best),
            )
            box_hit = tn <= tf
            if any_hit:
                box_hit = box_hit & (tri_best_holder[0] < 0)
            return box_hit, tn

        # Stack holds nodes whose box already passed the packet test
        # (children are tested at the parent; near child pushed last so
        # it pops first -> earlier t_best tightening).
        #
        # Latency discipline: every vector->scalar reduction stalls the
        # scalar pipeline, so each visit does at most TWO (the per-child
        # min-tn; `any hit` is derived from min < BIG), and the packet's
        # max best-t is carried as a scalar refreshed only after leaf
        # visits (t_best only shrinks there) instead of a max-reduce at
        # every pop.
        tri_best_holder = [None]

        def step_one(node, entry_tn, state):
            """Visit one popped node (already sp-adjusted)."""
            live = entry_tn <= state[1]

            def visit(args):
                sp, max_t, t_best, tri_best, b1_best, b2_best = args
                first, count, miss = fetch_meta(node)
                is_leaf = count > 0

                def do_leaf(args):
                    sp, max_t, t_best, tri_best, b1_best, b2_best = args
                    t_best, tri_best, b1_best, b2_best = leaf_tris(
                        first, count, t_best, tri_best, b1_best, b2_best
                    )
                    max_t = jnp.max(t_best)
                    return sp, max_t, t_best, tri_best, b1_best, b2_best

                def do_inner(args):
                    sp, max_t, t_best, tri_best, b1_best, b2_best = args
                    left = node + 1
                    right = first  # baked into the inner node's meta
                    hitL, tnL = box_test(left, t_best)
                    hitR, tnR = box_test(right, t_best)
                    minL = jnp.min(jnp.where(hitL, tnL, BIG_T))
                    minR = jnp.min(jnp.where(hitR, tnR, BIG_T))
                    anyL = minL < BIG_T
                    anyR = minR < BIG_T
                    l_nearer = minL <= minR
                    near = jnp.where(l_nearer, left, right)
                    far = jnp.where(l_nearer, right, left)
                    near_hit = jnp.where(l_nearer, anyL, anyR)
                    far_hit = jnp.where(l_nearer, anyR, anyL)
                    near_tn = jnp.minimum(minL, minR)
                    far_tn = jnp.maximum(minL, minR)
                    # push far first (conditionally advance sp), near last
                    stack_ref[sp] = far
                    tn_stack_ref[sp] = far_tn
                    sp = sp + far_hit.astype(jnp.int32)
                    stack_ref[sp] = near
                    tn_stack_ref[sp] = near_tn
                    sp = sp + near_hit.astype(jnp.int32)
                    return sp, max_t, t_best, tri_best, b1_best, b2_best

                return jax.lax.cond(is_leaf, do_leaf, do_inner, args)

            return jax.lax.cond(live, visit, lambda a: a, state)

        def body(state):
            tri_best_holder[0] = state[3]
            sp = state[0]
            node_a = stack_ref[sp - 1]
            tn_a = tn_stack_ref[sp - 1]
            if ways == 2:
                # superscalar pop: visit TWO stack entries per iteration —
                # their scalar fetch/reduce chains are independent, so the
                # compiler can overlap them, halving the per-node latency
                # the traversal is bound by. Node B uses A's (stale)
                # t_best/max_t — conservative, still correct.
                has_b = sp >= 2
                idx_b = jnp.maximum(sp - 2, 0)
                node_b = stack_ref[idx_b]
                tn_b = tn_stack_ref[idx_b]
                sp = sp - 1 - has_b.astype(jnp.int32)
                state = (sp,) + state[1:]
                state = step_one(node_a, tn_a, state)
                state = jax.lax.cond(
                    has_b,
                    lambda s: step_one(node_b, tn_b, s),
                    lambda s: s,
                    state,
                )
            else:
                state = (sp - 1,) + state[1:]
                state = step_one(node_a, tn_a, state)
            return state

        def cond(state):
            sp = state[0]
            if any_hit:
                return (sp > 0) & jnp.any(state[3] < 0)
            return sp > 0

        init = (
            jnp.int32(1),
            jnp.max(maxt),
            maxt,
            jnp.full((rows, 128), -1, jnp.int32),
            jnp.zeros((rows, 128), jnp.float32),
            jnp.zeros((rows, 128), jnp.float32),
        )
        _, _, t_best, tri_best, b1_best, b2_best = jax.lax.while_loop(
            cond, body, init
        )
        t_ref[0] = t_best
        tri_ref[0] = tri_best
        b1_ref[0] = b1_best
        b2_ref[0] = b2_best

    return kernel


@partial(jax.jit, static_argnames=("max_leaf", "any_hit", "rows", "ways",
                                   "aligned", "interpret"))
def trace_packets(
    nodes, meta, tris,  # packed device arrays
    o, d, mint, maxt,  # (R, 3), (R, 3), (R,), (R,) with R % (rows*128) == 0
    max_leaf: int = 4,
    any_hit: bool = False,
    rows: int = 8,
    ways: int = 1,
    aligned: bool = False,
    interpret: bool = False,
):
    """Packet trace. Returns (hit, t, tri, b1, b2) shaped (R,)."""
    R = o.shape[0]
    packet = rows * 128
    P = R // packet

    def shape8(x):
        return x.reshape(P, rows, 128)

    comps = [
        shape8(o[:, 0]), shape8(o[:, 1]), shape8(o[:, 2]),
        shape8(d[:, 0]), shape8(d[:, 1]), shape8(d[:, 2]),
        shape8(mint), shape8(jnp.minimum(maxt, BIG_T)),
    ]
    kernel = _make_kernel(max_leaf, any_hit, rows, ways, aligned)
    ray_spec = pl.BlockSpec((1, rows, 128), lambda p: (p, 0, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((P, rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((P, rows, 128), jnp.int32),
        jax.ShapeDtypeStruct((P, rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((P, rows, 128), jnp.float32),
    ]
    t, tri, b1, b2 = pl.pallas_call(
        kernel,
        grid=(P,),
        in_specs=[full(nodes), full(meta), full(tris)] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((STACK_DEPTH,), jnp.float32),
        ],
        interpret=interpret,
    )(nodes, meta, tris, *comps)
    t = t.reshape(R)
    tri = tri.reshape(R)
    hit = tri >= 0
    return hit, jnp.where(hit, t, BIG_T), tri, b1.reshape(R), b2.reshape(R)


# ---------------------------------------------------------------------------
# On SMEM-resident node kernels (investigated, abandoned): holding the
# node bounds/meta as SMEM scalars would remove the one-hot extract +
# sum-reduce (a vector->scalar sync) from every node fetch — the
# traversal's dominant latency chain. Two variants were built and both
# pass interpret-mode parity with the VMEM kernel, but both FAULT the
# TPU-v5e worker when run on hardware (scalar-prefetch grid AND plain
# SMEM-input BlockSpecs alike; tiny scenes included), killing the remote
# tunnel for hours per attempt. The working design keeps nodes
# lane-packed in VMEM with one-hot extraction and instead minimizes the
# number of vector->scalar reductions per visit (see the kernel body).
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# 4-wide BVH ("BVH4"): collapse the binary tree so each visit tests FOUR
# child boxes. The traversal is latency-bound on per-visit scalar syncs
# (meta fetch, min-reduction, branches, stack ops); a 4-wide node halves
# the visit count for the same box-test vector work, and the four
# children's min-tn values come out of ONE batched reduction.
# ---------------------------------------------------------------------------


def collapse4(bounds: np.ndarray, meta: np.ndarray, width: int = 4):
    """Binary BVHArrays (pre-order, skip links, leaf firsts 8-aligned)
    -> width-wide node arrays (width in {4, 8}).

    Returns (nb (N,128) f32, nm (N,128) i32): one row per node;
    child c occupies bounds lanes c*8..c*8+5 and meta lanes c*4..c*4+1
    with [f0, count]: count>0 leaf (f0=first_tri), count==0 inner
    (f0=child node id), count==-1 empty slot.

    nb ALSO carries the meta ints bitcast into its free lanes
    width*8 + c*4 .. +1 so the kernel resolves bounds AND meta from ONE
    row fetch + one extract chain. The ints are biased by
    +1 then OR 0x40000000 before the f32 bitcast: the extract reduction
    sums masked floats, and small-int bit patterns are DENORMALS that
    TPU float adds flush to zero — the bias keeps every field a normal
    float (exact under x + 0.0)."""
    N = bounds.shape[0]

    def area(j):
        d = np.maximum(bounds[j, 3:6] - bounds[j, 0:3], 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    def kids(j):
        left = j + 1
        right = int(meta[left, 2])
        return left, right

    is_leaf = meta[:, 1] > 0

    nb4_rows: list[np.ndarray] = []
    nm4_rows: list[np.ndarray] = []

    def emit(j) -> int:
        """Emit the 4-wide node for binary INNER node j; return its id."""
        my = len(nb4_rows)
        nb4_rows.append(np.zeros(128, np.float32))
        nm4_rows.append(np.full(128, 0, np.int32))
        # gather up to `width` subtree roots under j
        group = list(kids(j))
        while len(group) < width:
            inners = [g for g in group if not is_leaf[g]]
            if not inners:
                break
            big = max(inners, key=area)
            gi = group.index(big)
            group[gi:gi + 1] = list(kids(big))
        row_b = nb4_rows[my]
        row_m = nm4_rows[my]
        for c in range(width):
            if c < len(group):
                g = group[c]
                row_b[c * 8:c * 8 + 6] = bounds[g]
                if is_leaf[g]:
                    row_m[c * 4 + 0] = meta[g, 0]
                    row_m[c * 4 + 1] = meta[g, 1]
                else:
                    row_m[c * 4 + 1] = 0
                    row_m[c * 4 + 0] = emit(g)
            else:
                row_m[c * 4 + 1] = -1  # empty
        return my

    def bias_pack(row_b, row_m):
        if width * 12 <= 128:
            enc = ((np.asarray(row_m[: width * 4], np.int64) + 1)
                   | 0x40000000).astype(np.int32)
            off = width * 8
            row_b[off:off + width * 4] = enc.view(np.float32)

    import sys

    sys.setrecursionlimit(max(10000, 64 + 2 * N))
    if is_leaf[0]:
        # degenerate single-leaf scene: pseudo-root with one leaf child
        row_b = np.zeros(128, np.float32)
        row_m = np.full(128, 0, np.int32)
        row_b[0:6] = bounds[0]
        row_m[0] = meta[0, 0]
        row_m[1] = meta[0, 1]
        for c in range(1, width):
            row_m[c * 4 + 1] = -1
        nb4_rows.append(row_b)
        nm4_rows.append(row_m)
    else:
        emit(0)
    for row_b, row_m in zip(nb4_rows, nm4_rows):
        bias_pack(row_b, row_m)
    return np.stack(nb4_rows), np.stack(nm4_rows)


def _make_kernel4(max_leaf: int, any_hit: bool, rows: int,
                  width: int = 4, bf16_box: bool = False, ways: int = 1,
                  stats: bool = False, dyn_leaf: bool = False,
                  cull: bool = True, sort_children: bool = True):
    assert max_leaf % 8 == 0 and max_leaf <= 127

    def kernel(nb_ref, nm_ref, tris_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               mint_ref, maxt_ref,
               t_ref, tri_ref, b1_ref, b2_ref,
               *stats_and_scratch):
        if stats:
            stats_ref, stack_ref, tn_stack_ref = stats_and_scratch
        else:
            stack_ref, tn_stack_ref = stats_and_scratch
            stats_ref = None
        ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
        dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
        mint = mint_ref[0]
        maxt = maxt_ref[0]
        tiny = 1e-30
        inv_dx = 1.0 / jnp.where(dx == 0.0, tiny, dx)
        inv_dy = 1.0 / jnp.where(dy == 0.0, tiny, dy)
        inv_dz = 1.0 / jnp.where(dz == 0.0, tiny, dz)

        stack_ref[0] = 0  # root node id (inner encoding: >= 0)
        tn_stack_ref[0] = -BIG_T

        def tri_test(tv, tri_id, k, count, t_best, tri_best, b1_best,
                     b2_best):
            v0x, v0y, v0z = tv(0), tv(1), tv(2)
            e1x, e1y, e1z = tv(3), tv(4), tv(5)
            e2x, e2y, e2z = tv(6), tv(7), tv(8)
            s1x = dy * e2z - dz * e2y
            s1y = dz * e2x - dx * e2z
            s1z = dx * e2y - dy * e2x
            div = s1x * e1x + s1y * e1y + s1z * e1z
            inv = 1.0 / jnp.where(div == 0.0, tiny, div)
            sx = ox - v0x
            sy = oy - v0y
            sz = oz - v0z
            b1 = (sx * s1x + sy * s1y + sz * s1z) * inv
            s2x = sy * e1z - sz * e1y
            s2y = sz * e1x - sx * e1z
            s2z = sx * e1y - sy * e1x
            b2 = (dx * s2x + dy * s2y + dz * s2z) * inv
            t = (e2x * s2x + e2y * s2y + e2z * s2z) * inv
            eps = 1e-7
            hit = (
                (div != 0.0)
                & (b1 + eps >= 0.0) & (b1 - eps <= 1.0)
                & (b2 + eps >= 0.0) & (b1 + b2 - eps <= 1.0)
                & (t >= mint) & (t <= t_best)
                & (k < count)
            )
            t_best = jnp.where(hit, t, t_best)
            tri_best = jnp.where(hit, tri_id, tri_best)
            b1_best = jnp.where(hit, b1, b1_best)
            b2_best = jnp.where(hit, b2, b2_best)
            return t_best, tri_best, b1_best, b2_best

        def leaf_group(g, base_k, count, t_best, tri_best, b1_best,
                       b2_best):
            """Moller-Trumbore for a whole 8-triangle group as (8, rows,
            128) tensor ops — no per-triangle scalar extraction, one
            cross-lane reduce per group (the transpose), and the
            candidate merge is 8 vector selects."""
            grow = tris_ref[pl.ds(g, 1), :]
            blk = _extract_block(grow, 0, 128)  # (128, 1)
            bm = blk.reshape(8, 16)  # [tri-in-group, component]

            def comp(i):
                return bm[:, i].reshape(8, 1, 1)

            v0x, v0y, v0z = comp(0), comp(1), comp(2)
            e1x, e1y, e1z = comp(3), comp(4), comp(5)
            e2x, e2y, e2z = comp(6), comp(7), comp(8)
            dxw, dyw, dzw = dx[None], dy[None], dz[None]
            s1x = dyw * e2z - dzw * e2y
            s1y = dzw * e2x - dxw * e2z
            s1z = dxw * e2y - dyw * e2x
            div = s1x * e1x + s1y * e1y + s1z * e1z
            inv = 1.0 / jnp.where(div == 0.0, tiny, div)
            sx = ox[None] - v0x
            sy = oy[None] - v0y
            sz = oz[None] - v0z
            b1 = (sx * s1x + sy * s1y + sz * s1z) * inv
            s2x = sy * e1z - sz * e1y
            s2y = sz * e1x - sx * e1z
            s2z = sx * e1y - sy * e1x
            b2 = (dxw * s2x + dyw * s2y + dzw * s2z) * inv
            t = (e2x * s2x + e2y * s2y + e2z * s2z) * inv
            eps = 1e-7
            kcol = jax.lax.broadcasted_iota(
                jnp.int32, (8, 1, 1), 0
            ) + base_k
            hit = (
                (div != 0.0)
                & (b1 + eps >= 0.0) & (b1 - eps <= 1.0)
                & (b2 + eps >= 0.0) & (b1 + b2 - eps <= 1.0)
                & (t >= mint[None]) & (t <= t_best[None])
                & (kcol < count)
            )
            # merge the 8 candidates front-to-... order within the leaf
            # is arbitrary: keep the smallest t per lane (matches the
            # sequential loop's monotone tightening)
            for c in range(8):
                h = hit[c] & (t[c] <= t_best)
                t_best = jnp.where(h, t[c], t_best)
                tri_best = jnp.where(h, first_holder[0] + base_k + c,
                                     tri_best)
                b1_best = jnp.where(h, b1[c], b1_best)
                b2_best = jnp.where(h, b2[c], b2_best)
            return t_best, tri_best, b1_best, b2_best

        first_holder = [None]

        def leaf_tris(first, count, t_best, tri_best, b1_best, b2_best):
            first_holder[0] = first
            g0 = first // 8
            if dyn_leaf:
                # dynamic trip count: only the leaf's actual ceil(count/8)
                # 8-triangle groups are tested. The static unroll paid the
                # full max_leaf//8 groups of (8, rows, 128) vector work on
                # every leaf visit — at bunny's mean fill of ~23/32 that
                # is ~26% wasted lanes, and leaf visits dominate bounce
                # traces (visit census, tools/trace_profile.py).
                def gbody(gk, carry):
                    return leaf_group(g0 + gk, gk * 8, count, *carry)

                return jax.lax.fori_loop(
                    0, (count + 7) // 8, gbody,
                    (t_best, tri_best, b1_best, b2_best),
                )
            for gk in range(max_leaf // 8):
                t_best, tri_best, b1_best, b2_best = leaf_group(
                    g0 + gk, gk * 8, count, t_best, tri_best, b1_best,
                    b2_best,
                )
            return t_best, tri_best, b1_best, b2_best

        def step_one(e, entry_tn, state):
            """Visit one popped stack entry (sp already adjusted)."""
            live = (entry_tn <= state[1]) if cull else None

            def visit(args):
                is_inner = e >= 0

                def do_leaf(args):
                    sp, max_t, t_best, tri_best, b1_best, b2_best = args[:6]
                    extra = args[6:]
                    if stats:
                        extra = (extra[0], extra[1] + 1) + extra[2:]
                    dec = -(e + 1)
                    count = dec & 127
                    first = (dec >> 7) * 8
                    t_best, tri_best, b1_best, b2_best = leaf_tris(
                        first, count, t_best, tri_best, b1_best, b2_best
                    )
                    if cull:
                        max_t = jnp.max(t_best)
                    return (sp, max_t, t_best, tri_best, b1_best,
                            b2_best) + extra

                def do_inner(args):
                    sp, max_t, t_best, tri_best, b1_best, b2_best = args[:6]
                    extra = args[6:]
                    if stats:
                        extra = (extra[0] + 1,) + extra[1:]
                    brow = nb_ref[pl.ds(e, 1), :]
                    if width * 12 <= 128:
                        # bounds AND (biased, f32-bitcast) meta from ONE
                        # row fetch + one extract chain (see collapse4)
                        bbmm = _extract_block(brow, 0, width * 12)
                        bb = bbmm[: width * 8]
                        mm = (jax.lax.bitcast_convert_type(
                            bbmm[width * 8:], jnp.int32)
                            & ~jnp.int32(0x40000000)) - 1
                    else:
                        mrow = nm_ref[pl.ds(e, 1), :]
                        bb = _extract_block(brow, 0, width * 8)
                        mm = _extract_block(mrow, 0, width * 4)
                    tbq = t_best
                    if any_hit:
                        tbq = jnp.where(tri_best < 0, t_best, -BIG_T)
                    # ALL children's slab tests as one (width, rows,
                    # 128) tensor op — the per-child scalar reads of the
                    # extracted bounds were ~48 vector->scalar moves per
                    # visit, the traversal's dominant latency
                    bbs = bb.reshape(width, 8)
                    bmnx = bbs[:, 0].reshape(width, 1, 1)
                    bmny = bbs[:, 1].reshape(width, 1, 1)
                    bmnz = bbs[:, 2].reshape(width, 1, 1)
                    bmxx = bbs[:, 3].reshape(width, 1, 1)
                    bmxy = bbs[:, 4].reshape(width, 1, 1)
                    bmxz = bbs[:, 5].reshape(width, 1, 1)
                    if bf16_box:
                        oxw, oyw, ozw = (v[None].astype(jnp.bfloat16)
                                         for v in (ox, oy, oz))
                        ixw, iyw, izw = (v[None].astype(jnp.bfloat16)
                                         for v in (inv_dx, inv_dy, inv_dz))
                        bmnx, bmny, bmnz, bmxx, bmxy, bmxz = (
                            v.astype(jnp.bfloat16)
                            for v in (bmnx, bmny, bmnz, bmxx, bmxy, bmxz)
                        )
                    else:
                        oxw, oyw, ozw = ox[None], oy[None], oz[None]
                        ixw, iyw, izw = (inv_dx[None], inv_dy[None],
                                         inv_dz[None])
                    t0x = (bmnx - oxw) * ixw
                    t1x = (bmxx - oxw) * ixw
                    t0y = (bmny - oyw) * iyw
                    t1y = (bmxy - oyw) * iyw
                    t0z = (bmnz - ozw) * izw
                    t1z = (bmxz - ozw) * izw
                    tn_a = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.minimum(t0z, t1z),
                    )
                    tf_a = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z),
                    )
                    if bf16_box:
                        # conservative margin. bf16 rounding happens on
                        # the OPERANDS (bmin-o)*inv, so the error scales
                        # with the slab-t magnitudes, not with tn/tf —
                        # a ray origin near a box face (tn~0, large
                        # coords) still carries operand-sized error
                        # (ADVICE r4). Widen by the largest |t| seen on
                        # any axis.
                        tn_a = tn_a.astype(jnp.float32)
                        tf_a = tf_a.astype(jnp.float32)
                        tmag = jnp.maximum(
                            jnp.maximum(jnp.abs(t0x), jnp.abs(t1x)),
                            jnp.maximum(
                                jnp.maximum(jnp.abs(t0y), jnp.abs(t1y)),
                                jnp.maximum(jnp.abs(t0z), jnp.abs(t1z)),
                            ),
                        ).astype(jnp.float32)
                        tn_a = tn_a - 0.06 * tmag
                        tf_a = tf_a + 0.06 * tmag
                    tn_a = jnp.maximum(tn_a, mint[None])
                    tf_a = jnp.minimum(tf_a, tbq[None])
                    tn_masked = jnp.where(tn_a <= tf_a, tn_a, BIG_T)
                    # ONE batched reduction for all children
                    mins4 = jnp.min(
                        tn_masked.reshape(width, rows * 128),
                        axis=1, keepdims=True,
                    )  # (width, 1)
                    # entry/key encode as (width, 4)-vector math — the
                    # per-child scalar encode chain (shift/or/where x8)
                    # was pure scalar-issue pressure; only the final
                    # sublane reads stay scalar. Validity is folded into
                    # the key (invalid -> BIG) so sort items are 2-tuples
                    mmr = mm.reshape(width, 4)
                    f0_v = mmr[:, 0:1]
                    cnt_v = mmr[:, 1:2]
                    entry_v = jnp.where(
                        cnt_v > 0,
                        -(((f0_v // 8) << 7) | cnt_v) - 1,
                        f0_v,
                    )
                    key_v = jnp.where(
                        (cnt_v >= 0) & (mins4 < BIG_T), mins4, BIG_T
                    )
                    items = [(key_v[c, 0], entry_v[c, 0])
                             for c in range(width)]

                    def cswap(a, b):  # after: a.key <= b.key
                        sw = a[0] > b[0]
                        na = tuple(jnp.where(sw, y, x)
                                   for x, y in zip(a, b))
                        nb = tuple(jnp.where(sw, x, y)
                                   for x, y in zip(a, b))
                        return na, nb

                    # invalid children sort to the BACK (tn = BIG via the
                    # mins mask; empty slots get BIG explicitly) so the
                    # front element is the nearest VALID child
                    # optimal sorting networks (4: 5 comparators,
                    # 8: 19 comparators)
                    if width == 4:
                        net = [(0, 1), (2, 3), (0, 2), (1, 3), (1, 2)]
                    else:
                        net = [(0, 1), (2, 3), (4, 5), (6, 7),
                               (0, 2), (1, 3), (4, 6), (5, 7),
                               (1, 2), (5, 6), (0, 4), (3, 7),
                               (1, 5), (2, 6), (1, 4), (3, 6),
                               (2, 4), (3, 5), (3, 4)]
                    if sort_children:
                        for a, b in net:
                            items[a], items[b] = cswap(items[a],
                                                       items[b])
                    # push far -> near so the nearest pops first
                    for key_c, entry_c in reversed(items):
                        stack_ref[sp] = entry_c
                        if cull:
                            tn_stack_ref[sp] = key_c
                        sp = sp + (key_c < BIG_T).astype(jnp.int32)
                    return (sp, max_t, t_best, tri_best, b1_best,
                            b2_best) + extra

                return jax.lax.cond(is_inner, do_inner, do_leaf, args)

            if not cull:
                # tn-cull machinery removed: the census measured culled
                # pops at ~0.1% of iterations on production wavefronts
                # (ordered pushes mean t_best rarely shrinks below a
                # pushed child's tn before it pops), so the per-
                # iteration live-branch + tn stack traffic + per-leaf
                # packet-max reduction cost more than the cull saves
                return visit(state)
            return jax.lax.cond(live, visit, lambda a: a, state)

        def body(state):
            if stats:
                # count loop iterations (incl. culled pops) separately
                state = state[:8] + (state[8] + 1,)
            sp = state[0]
            e_a = stack_ref[sp - 1]
            tn_a = tn_stack_ref[sp - 1] if cull else jnp.float32(0)
            if ways == 2:
                # superscalar pop (ported from the binary kernel,
                # measured win there): visit TWO stack entries per
                # iteration — their scalar fetch/extract/reduce chains
                # are independent, so the compiler overlaps them, hiding
                # the per-visit scalar sync latency the traversal is
                # bound by. B uses A's (stale) max_t — conservative,
                # still correct; A's pushes land above where B sat, so
                # the pops don't collide.
                has_b = sp >= 2
                idx_b = jnp.maximum(sp - 2, 0)
                e_b = stack_ref[idx_b]
                tn_b = tn_stack_ref[idx_b] if cull else jnp.float32(0)
                sp = sp - 1 - has_b.astype(jnp.int32)
                state = (sp,) + state[1:]
                state = step_one(e_a, tn_a, state)
                state = jax.lax.cond(
                    has_b,
                    lambda s: step_one(e_b, tn_b, s),
                    lambda s: s,
                    state,
                )
            else:
                state = (sp - 1,) + state[1:]
                state = step_one(e_a, tn_a, state)
            return state

        def cond(state):
            sp = state[0]
            if any_hit:
                return (sp > 0) & jnp.any(state[3] < 0)
            return sp > 0

        init = (
            jnp.int32(1),
            jnp.max(maxt),
            maxt,
            jnp.full((rows, 128), -1, jnp.int32),
            jnp.zeros((rows, 128), jnp.float32),
            jnp.zeros((rows, 128), jnp.float32),
        )
        if stats:
            init = init + (jnp.int32(0), jnp.int32(0), jnp.int32(0))
        out = jax.lax.while_loop(cond, body, init)
        _, _, t_best, tri_best, b1_best, b2_best = out[:6]
        t_ref[0] = t_best
        tri_ref[0] = tri_best
        b1_ref[0] = b1_best
        b2_ref[0] = b2_best
        if stats:
            lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
            stats_ref[0] = jnp.where(
                (row == 0) & (lane == 0), out[6],
                jnp.where(
                    (row == 0) & (lane == 1), out[7],
                    jnp.where((row == 0) & (lane == 2), out[8], 0),
                ),
            )

    return kernel


@partial(jax.jit, static_argnames=("max_leaf", "any_hit", "rows", "width",
                                   "bf16_box", "ways", "stats", "dyn_leaf",
                                   "cull", "sort_children", "interpret"))
def trace_packets4(
    nb4, nm4, tris,
    o, d, mint, maxt,
    max_leaf: int = 64,
    any_hit: bool = False,
    rows: int = 32,
    width: int = 4,
    bf16_box: bool = False,
    ways: int = 1,
    stats: bool = False,
    dyn_leaf: bool = False,
    cull: bool = True,
    sort_children: bool = True,
    interpret: bool = False,
):
    """4-wide packet trace. Same contract as trace_packets."""
    R = o.shape[0]
    packet = rows * 128
    P = R // packet

    def shape8(x):
        return x.reshape(P, rows, 128)

    comps = [
        shape8(o[:, 0]), shape8(o[:, 1]), shape8(o[:, 2]),
        shape8(d[:, 0]), shape8(d[:, 1]), shape8(d[:, 2]),
        shape8(mint), shape8(jnp.minimum(maxt, BIG_T)),
    ]
    kernel = _make_kernel4(max_leaf, any_hit, rows, width, bf16_box, ways,
                           stats, dyn_leaf, cull, sort_children)
    ray_spec = pl.BlockSpec((1, rows, 128), lambda p: (p, 0, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((P, rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((P, rows, 128), jnp.int32),
        jax.ShapeDtypeStruct((P, rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((P, rows, 128), jnp.float32),
    ]
    n_out = 4
    if stats:
        # per-packet visit counters: [0,0]=inner visits, [0,1]=leaf
        # visits (tools/trace_profile.py reads these to locate the
        # kernel's cost split)
        out_shape.append(jax.ShapeDtypeStruct((P, rows, 128), jnp.int32))
        n_out = 5
    outs = pl.pallas_call(
        kernel,
        grid=(P,),
        in_specs=[full(nb4), full(nm4), full(tris)] + [ray_spec] * 8,
        out_specs=[ray_spec] * n_out,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((STACK_DEPTH,), jnp.float32),
        ],
        interpret=interpret,
    )(nb4, nm4, tris, *comps)
    t, tri, b1, b2 = outs[:4]
    t = t.reshape(R)
    tri = tri.reshape(R)
    hit = tri >= 0
    res = (hit, jnp.where(hit, t, BIG_T), tri, b1.reshape(R),
           b2.reshape(R))
    if stats:
        return res + (outs[4][:, 0, 0:3],)  # (P,3): inner, leaf, iters
    return res
