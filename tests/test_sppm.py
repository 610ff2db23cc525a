"""SPPM correctness: converges to the PT estimate (consistency oracle)."""

import json
import os

import numpy as np
import pytest

from goblin_tpu.integrators import common
from goblin_tpu.integrators.path import make_li as make_path
from goblin_tpu.integrators.sppm import render_sppm
from goblin_tpu.scene.loader import load_scene


def _scene(tmp_path, spp=4, depth=4, res=(20, 16)):
    doc = {
        "render_setting": {"render_method": "sppm", "sample_per_pixel": spp,
                           "max_ray_depth": depth},
        "camera": {
            "position": [0, 1.2, -2.2],
            "euler": [20, 0, 0],
            "rotation_order": "xyz",
            "fov": 50.0,
            "film": {"resolution": list(res)},
            "filter": {"type": "box", "width": [0.5, 0.5]},
        },
        "geometries": [{"name": "floor", "type": "mesh", "file": "plane.obj"}],
        "textures": [
            {"format": "color", "name": "grey", "type": "constant",
             "color": [0.7, 0.7, 0.7]},
        ],
        "materials": [{"name": "diffuse", "type": "lambert", "Kd": "grey"}],
        "primitives": [
            {"type": "model", "name": "fm", "geometry": "floor",
             "material": "diffuse"},
            {"type": "instance", "name": "fi", "model": "fm",
             "scale": [30, 30, 30]},
            # a wall to catch bounced light
            {"type": "instance", "name": "wall", "model": "fm",
             "position": [0, 0, 2.0], "euler": [-90, 0, 0],
             "rotation_order": "xyz", "scale": [30, 30, 30]},
        ],
        "lights": [
            {"name": "key", "type": "point", "intensity": [10, 10, 10],
             "position": [0.5, 2.5, -0.5]},
        ],
    }
    with open(os.path.join(tmp_path, "plane.obj"), "w") as f:
        f.write(
            "v -1 0 1\nv 1 0 1\nv -1 0 -1\nv 1 0 -1\n"
            "vn 0 1 0\nf 1//1 2//1 3//1\nf 3//1 2//1 4//1\n"
        )
    p = os.path.join(tmp_path, "scene.json")
    with open(p, "w") as f:
        json.dump(doc, f)
    return p


def test_sppm_matches_pt(tmp_path):
    p = _scene(str(tmp_path), spp=8, depth=4)
    scene, meta = load_scene(p)
    img_pt = np.asarray(common.render(scene, meta, make_path(meta), spp=16,
                                      chunk_size=512))
    img_sp = np.asarray(render_sppm(scene, meta, chunk_size=512,
                                    iterations=8))
    assert np.isfinite(img_sp).all()
    a = img_pt[..., 0]
    b = img_sp[..., 0]
    assert a.mean() > 0.01 and b.mean() > 0.01
    # SPPM = direct (exact same estimator as PT direct) + photon GI;
    # total brightness should agree within photon noise/bias tolerance
    np.testing.assert_allclose(b.mean(), a.mean(), rtol=0.2)
    corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
    assert corr > 0.85


def test_sppm_radius_shrinks(tmp_path):
    p = _scene(str(tmp_path), spp=2, depth=3)
    scene, meta = load_scene(p)
    # run a couple of iterations and check it doesn't blow up
    img = np.asarray(render_sppm(scene, meta, chunk_size=512, iterations=2))
    assert np.isfinite(img).all()
    assert img.max() < 1e3


def test_photon_deposit_flux_conserved_dense_cell(tmp_path):
    """The sort-based grid + while-drain deposit must find EXACTLY the
    same (photon, visible-point) pairs as a brute-force O(N*P) sweep —
    including when hundreds of visible points share one cell (the
    dense-caustic regime that previously overflowed a fixed K_MAX cap
    and silently dropped energy)."""
    import jax.numpy as jnp

    from goblin_tpu.integrators.sppm import (make_photon_passes,
                                             vp_cell_meta)
    from goblin_tpu.integrators.materials import gather_material
    from goblin_tpu.lights import lights as lt
    from goblin_tpu.shading import bsdf as bx
    from goblin_tpu.splatting import walk_light_paths, _env_le_at
    from goblin_tpu.core import vecmath as vm

    p = _scene(str(tmp_path), spp=2, depth=3)
    scene, meta = load_scene(p)
    n_pix = 320
    seed = 123
    max_len = 3

    # dense visible-point cloud: all points in a tiny disc on the floor
    # under the light -> one (or few) grid cells hold ALL of them
    rng = np.random.default_rng(0)
    # cluster on the WALL (z=2): bounced photons' second vertices land
    # there, so path_len=2 deposits hit the dense cell
    pts = np.zeros((n_pix, 3), np.float32)
    pts[:, 0] = rng.uniform(-1.0, 1.0, n_pix)
    pts[:, 1] = rng.uniform(0.0, 2.0, n_pix)
    pts[:, 2] = 2.0
    vp = {
        "p": jnp.asarray(pts),
        "ns": jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n_pix, 3)),
        "dpdu": jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n_pix, 3)),
        "uv": jnp.zeros((n_pix, 2)),
        "mat": jnp.full((n_pix,), 1, jnp.int32),
        "wo": jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n_pix, 3)),
        "tp": jnp.ones((n_pix, 3)),
        "len": jnp.ones((n_pix,), jnp.int32),
        "valid": jnp.ones((n_pix,), bool),
    }
    radius = jnp.full((n_pix,), 2.5, jnp.float32)
    bbox_min, inv_len, max_r = vp_cell_meta(vp, radius)

    deposit_chunk, vp_drain = make_photon_passes(scene, meta, seed,
                                                 max_len, n_pix)
    ids = jnp.arange(256, dtype=jnp.int32)
    Phi = jnp.zeros((n_pix, 3))
    Mi = jnp.zeros((n_pix,))
    rows, e_hash, e_idx = deposit_chunk(ids, jnp.int32(0), bbox_min,
                                        inv_len, max_r)
    Phi, Mi = vp_drain(vp, radius, rows, e_hash, e_idx, bbox_min,
                       inv_len, Phi, Mi)
    Phi, Mi = np.asarray(Phi), np.asarray(Mi)

    # brute force O(N*P): rerun the identical light walk and test every
    # (photon vertex, visible point) pair directly
    em, verts = walk_light_paths(scene, meta, ids, jnp.int32(0), seed,
                                 max_len + 1, mode=bx.MODE_RADIANCE)
    le_scale = lt.eval_emission(
        scene["lights"], em["lid"], em["n"], em["dir"],
        env_le=_env_le_at(scene, meta, em["dir"]),
    )
    Phi_bf = np.zeros((n_pix, 3), np.float32)
    Mi_bf = np.zeros(n_pix, np.float32)
    D = verts["p"].shape[0]
    for d in range(D):
        path_len = d + 1
        if path_len <= 1:
            continue
        pd = np.asarray(verts["p"][d])
        valid = np.asarray(verts["valid"][d])
        wgt = np.asarray(verts["tp"][d] * le_scale)
        wi = verts["wo_prev"][d]
        frag_v = {"mat": vp["mat"], "uv": vp["uv"]}
        mat_v = gather_material(scene, meta, frag_v)
        for j in range(ids.shape[0]):
            if not valid[j]:
                continue
            d2 = ((np.asarray(vp["p"]) - pd[j]) ** 2).sum(axis=-1)
            ok = (d2 <= np.asarray(radius) ** 2) & (
                np.asarray(vp["len"]) + path_len <= max_len
            )
            if not ok.any():
                continue
            fs = np.asarray(bx.bsdf_eval(
                mat_v, vp["ns"], vp["wo"],
                jnp.broadcast_to(wi[j], (n_pix, 3)), bx.BSDF_ALL,
            ))
            Phi_bf[ok] += fs[ok] * wgt[j]
            Mi_bf[ok] += 1.0
    assert Mi_bf.sum() > n_pix  # the dense regime actually exercised
    np.testing.assert_allclose(Mi, Mi_bf, rtol=0, atol=0.5)
    np.testing.assert_allclose(Phi.sum(), Phi_bf.sum(), rtol=1e-4)
    np.testing.assert_allclose(Phi, Phi_bf, rtol=1e-3, atol=1e-5)


def test_sppm_checkpoint_resume_bit_identical(tmp_path):
    """Save after 2 iterations, resume for 2 more == uninterrupted 4
    (the per-iteration QMC streams are keyed on the absolute iteration
    index, so resuming is bit-identical)."""
    import jax.numpy as jnp

    from goblin_tpu.integrators.sppm import (load_sppm_state, render_sppm,
                                             save_sppm_state)

    p = _scene(str(tmp_path), spp=4, depth=3)
    scene, meta = load_scene(p)
    full = np.asarray(render_sppm(scene, meta, chunk_size=256,
                                  iterations=4))
    _, st = render_sppm(scene, meta, chunk_size=256, iterations=2,
                        return_state=True)
    ckpt = str(tmp_path / "sppm.npz")
    save_sppm_state(ckpt, st)
    resumed = np.asarray(render_sppm(
        scene, meta, chunk_size=256, iterations=4,
        state=load_sppm_state(ckpt),
    ))
    np.testing.assert_array_equal(full, resumed)
