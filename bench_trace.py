#!/usr/bin/env python
"""Microbenchmark: the PRODUCTION traversal kernel on REAL wavefronts.

Round-4 verdict flagged the old version stale: it measured only the
binary-BVH kernel on synthetic rays while production dispatches the
wide (BVH4/8) kernel — a tuning tool that measures the wrong kernel
misdirects perf work. This version:

1. captures the actual ray wavefronts of one production render pass
   (primary, and per-bounce shadow + continuation rays, with their
   masked-dead lanes) by recording trace_rays inputs during an eager
   path-trace of one chunk;
2. times the production wide kernel (ops/pallas_trace.trace_packets4)
   across the tuning grid {width, rows, ways, bf16_box} x {none,
   octant, morton} reordering (reorder cost INCLUDED in the timing) on
   each captured class;
3. prints the best config per class so the production default
   (scene/bake.py SceneMeta) can be checked against it.

Not part of the driver bench — a tuning tool. GOBLIN_* env knobs
(GOBLIN_MAX_LEAF etc.) apply to the bake as in production.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

from goblin_tpu.assets import ensure_bunny_obj
from goblin_tpu.scene.loader import load_scene


def timeit(f, *args, iters=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def capture_wavefronts(scene, meta, chunk=1 << 14, depth=5):
    """Run one eager chunk of the path tracer, recording every
    trace_rays invocation's rays (the production wavefronts, masked
    dead lanes included)."""
    from goblin_tpu.integrators import common
    from goblin_tpu.integrators.path import make_li
    from goblin_tpu.scene import intersect as scn

    rec = []
    orig = scn.trace_rays

    def recorder(scene_, meta_, o, d, mint, maxt, any_hit=False, sort=None):
        rec.append({
            "o": np.asarray(o), "d": np.asarray(d),
            "mint": np.asarray(mint), "maxt": np.asarray(maxt),
            "any_hit": any_hit,
        })
        return orig(scene_, meta_, o, d, mint, maxt, any_hit=any_hit,
                    sort=sort)

    meta.settings["max_ray_depth"] = depth
    li = make_li(meta, unroll=True)
    spec = meta.camera.film
    # same tile-coherent pixel order as the production driver
    tile = max(8, int(np.sqrt(meta.trace_rows * 128)))
    xs_, xc, ys_, yc = spec.crop_window()
    row_major = (
        (np.arange(ys_, ys_ + yc)[:, None] * spec.x_res
         + np.arange(xs_, xs_ + xc)[None, :]).reshape(-1).astype(np.int32)
    )
    idx = np.arange(row_major.size, dtype=np.int32).reshape(yc, xc)
    perm = np.concatenate([
        idx[ty:ty + tile, tx:tx + tile].reshape(-1)
        for ty in range(0, yc, tile)
        for tx in range(0, xc, tile)
    ])
    # take evenly-spaced whole tiles across the frame (the first `chunk`
    # pixels of tile order would all come from the top strip — sky/floor
    # only, unrepresentative of the render's mixed wavefronts)
    tsz = tile * tile
    n_tiles = perm.size // tsz
    want = max(1, chunk // tsz)
    pick = np.linspace(0, n_tiles - 1, want).astype(np.int64)
    sel = perm[: n_tiles * tsz].reshape(n_tiles, tsz)[pick].reshape(-1)
    pixel_ids = jnp.asarray(row_major[sel][:chunk])
    x, y = common.pixel_samples(0, pixel_ids, spec.x_res, jnp.int32(0), 2)
    ray = meta.camera.generate_ray(x, y)
    scn.trace_rays = recorder
    try:
        li(scene, meta, ray, pixel_ids, jnp.int32(0), 0)
    finally:
        scn.trace_rays = orig

    waves = {}
    waves["primary"] = rec[0]
    shadows = [r for r in rec[1:] if r["any_hit"]]
    conts = [r for r in rec[1:] if not r["any_hit"]]
    for name, lst in (("shadow", shadows), ("bounce", conts)):
        for i, r in enumerate(lst):
            waves[f"{name}{i + 1}"] = r
    return waves


def reorder_fns(meta):
    from goblin_tpu.scene.intersect import _morton_key, _octant_partition

    bmin, bmax = meta.world_bounds
    bmin_j = jnp.asarray(bmin, jnp.float32)
    inv_ext = 1.0 / jnp.maximum(jnp.asarray(bmax, jnp.float32) - bmin_j,
                                1e-12)

    def none(o, d, mint, maxt):
        return o, d, mint, maxt

    def octant(o, d, mint, maxt):
        order = _octant_partition(d, mint, maxt)
        return tuple(v[order] for v in (o, d, mint, maxt))

    def morton(o, d, mint, maxt):
        key = _morton_key(o, d, mint, maxt, bmin_j, inv_ext)
        order = jnp.argsort(key)
        return tuple(v[order] for v in (o, d, mint, maxt))

    return {"none": none, "octant": octant, "morton": morton}


def main():
    ensure_bunny_obj(os.path.join(_REPO, "examples", "models", "bunny.obj"))
    scene, meta = load_scene(
        os.path.join(_REPO, "examples", "bunny.json"),
        {"render_method": "path_tracing"},
    )
    print(f"tris={meta.n_tris} max_leaf={meta.max_leaf} "
          f"prod: wide={meta.trace_wide} rows={meta.trace_rows} "
          f"ways={meta.trace_ways}")
    print("capturing production wavefronts (eager pass)...")
    waves = capture_wavefronts(scene, meta)
    # pad/tile each captured wavefront to 64k lanes: packets are
    # independent in the kernel grid, so tiling preserves per-packet
    # behavior while amortizing dispatch overhead
    for w in waves.values():
        reps = (1 << 16) // w["o"].shape[0]
        for k in ("o", "d", "mint", "maxt"):
            w[k] = np.tile(w[k], (reps,) + (1,) * (w[k].ndim - 1))
    for k, w in waves.items():
        live = float((w["maxt"] > w["mint"]).mean())
        print(f"  {k:10s}: {w['o'].shape[0]} lanes, {live:.0%} live, "
              f"any_hit={w['any_hit']}")

    from goblin_tpu.ops.pallas_trace import trace_packets4

    reorders = reorder_fns(meta)
    grid = []
    for width in (4, 8):
        for rows in (8, 16):
            for ways in (1, 2):
                grid.append((width, rows, ways, False))
    grid.append((8, 8, 1, True))  # bf16_box probe

    best = {}
    for wname, w in waves.items():
        R = w["o"].shape[0]
        o, d = jnp.asarray(w["o"]), jnp.asarray(w["d"])
        mint, maxt = jnp.asarray(w["mint"]), jnp.asarray(w["maxt"])
        rows_best = None
        for (width, rows, ways, bf16) in grid:
            key4 = "pk_nb4" if meta.trace_wide == width else None
            if width != meta.trace_wide:
                # re-collapse for the other width
                from goblin_tpu.accel.bvh import build_bvh  # noqa: F401
                from goblin_tpu.ops.pallas_trace import collapse4
                ck = f"_nb{width}"
                if ck not in scene:
                    nb_bin = np.asarray(scene["node_bounds"])
                    nm_bin = np.asarray(scene["node_meta"])
                    nb, nm = collapse4(nb_bin, nm_bin, width=width)
                    scene[ck] = jnp.asarray(nb)
                    scene[ck + "m"] = jnp.asarray(nm)
                nb4, nm4 = scene[ck], scene[ck + "m"]
            else:
                nb4, nm4 = scene["pk_nb4"], scene["pk_nm4"]
            for rname, rfn in reorders.items():
                if rname != "none" and wname == "primary":
                    continue  # primaries arrive tile-ordered

                @jax.jit
                def run(o, d, mint, maxt):
                    o2, d2, m2, x2 = rfn(o, d, mint, maxt)
                    pad = (-R) % (rows * 128)
                    if pad:
                        o2 = jnp.concatenate([o2, jnp.zeros((pad, 3))])
                        d2 = jnp.concatenate([d2, jnp.ones((pad, 3))])
                        m2 = jnp.concatenate([m2, jnp.full((pad,), 3e38)])
                        x2 = jnp.concatenate([x2, jnp.zeros((pad,))])
                    return trace_packets4(
                        nb4, nm4, scene["pk_tris"], o2, d2, m2, x2,
                        max_leaf=meta.max_leaf, any_hit=w["any_hit"],
                        rows=rows, width=width, bf16_box=bf16, ways=ways,
                    )

                dt = timeit(run, o, d, mint, maxt, iters=5)
                mr = R / dt / 1e6
                tag = (f"w{width} r{rows:2d} ways{ways}"
                       f"{' bf16' if bf16 else ''} {rname}")
                print(f"  {wname:10s} {tag:26s}: {mr:8.2f} Mrays/s")
                if rows_best is None or mr > rows_best[0]:
                    rows_best = (mr, tag)
        best[wname] = rows_best
    print("\nbest per class:")
    for k, (mr, tag) in best.items():
        print(f"  {k:10s}: {tag}  {mr:.2f} Mrays/s")


if __name__ == "__main__":
    main()
