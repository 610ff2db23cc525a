"""Camera-lens primitive (DOF), analytic disks, and the lens-hit
strategies: LT splatFilmT0/S1 and BDPT t=0 (reference
GoblinContextLoader.cpp:148-175, GoblinLightTracer.h:30-46,
GoblinBDPT.cpp:101-156)."""

import json
import os

import numpy as np
import pytest

from goblin_tpu.integrators import common
from goblin_tpu.integrators.path import make_li as make_path
from goblin_tpu.scene.loader import load_scene
from goblin_tpu.splatting import render_light_tracer


def _dof_scene(tmp_path, lens_radius=0.4, res=(24, 18), spp=4, depth=3,
               extra_settings=None):
    settings = {"render_method": "light_tracing", "sample_per_pixel": spp,
                "max_ray_depth": depth}
    if extra_settings:
        settings.update(extra_settings)
    doc = {
        "render_setting": settings,
        "camera": {
            "position": [0, 1.5, -2.5],
            "euler": [20, 0, 0],
            "rotation_order": "xyz",
            "fov": 45.0,
            "lens_radius": lens_radius,
            "focal_distance": 3.0,
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
        ],
        "lights": [
            {"name": "panel", "type": "area", "radiance": [30, 30, 30],
             "geometry": "floor", "position": [0.0, 2.5, 0.0],
             "euler": [180.0, 0.0, 0.0], "scale": [0.4, 0.4, 0.4]},
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


def test_lens_primitive_synthesized(tmp_path):
    p = _dof_scene(str(tmp_path), lens_radius=0.3)
    scene, meta = load_scene(p)
    assert meta.has_lens and meta.n_disks == 1
    assert float(scene["dsk_radius"][0]) == pytest.approx(0.3)
    assert bool(scene["dsk_lens"][0])
    # lens disk sits at the camera position, facing the camera look dir
    np.testing.assert_allclose(
        np.asarray(scene["dsk_center"][0]), [0, 1.5, -2.5], atol=1e-6
    )
    np.testing.assert_allclose(
        np.abs(np.asarray(scene["dsk_n"][0]) @ np.asarray(meta.camera.look)),
        1.0, atol=1e-5,
    )


def test_analytic_disk_intersect(tmp_path):
    """A plain (non-light) disk is analytic: exact circular silhouette
    and the reference's disk uv/dpdu frame (GoblinDisk.cpp:12-61)."""
    import jax.numpy as jnp

    from goblin_tpu.scene import intersect as scn

    doc = {
        "render_setting": {"render_method": "path_tracing"},
        "camera": {"position": [0, 0, -3], "fov": 45,
                   "film": {"resolution": [16, 16]},
                   "filter": {"type": "box", "width": [0.5, 0.5]}},
        "geometries": [{"name": "d", "type": "disk", "radius": 1.0}],
        "textures": [{"format": "color", "name": "g", "type": "constant",
                      "color": [0.5, 0.5, 0.5]}],
        "materials": [{"name": "m", "type": "lambert", "Kd": "g"}],
        "primitives": [
            {"type": "model", "name": "dm", "geometry": "d", "material": "m"},
            {"type": "instance", "name": "di", "model": "dm"},
        ],
        "lights": [{"name": "k", "type": "point", "intensity": [1, 1, 1],
                    "position": [0, 0, -2]}],
    }
    p = os.path.join(str(tmp_path), "scene.json")
    json.dump(doc, open(p, "w"))
    scene, meta = load_scene(p)
    assert meta.n_disks == 1 and not meta.has_lens
    # rays along +z at various radii: hit iff r <= 1, exactly
    for r, expect in [(0.0, True), (0.999, True), (1.001, False),
                      (5.0, False)]:
        o = jnp.asarray([[r, 0.0, -3.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        frag = scn.intersect(scene, meta, o, d, jnp.asarray([1e-3]),
                             jnp.asarray([1e9]))
        assert bool(frag["hit"][0]) == expect, r
        if expect:
            np.testing.assert_allclose(float(frag["t"][0]), 3.0, rtol=1e-5)
            np.testing.assert_allclose(
                np.abs(np.asarray(frag["ns"][0])), [0, 0, 1], atol=1e-6
            )
    # occlusion via the disk
    occ = scn.occluded(scene, meta, jnp.asarray([[0.5, 0, -3.0]]),
                       jnp.asarray([[0.0, 0, 1.0]]),
                       jnp.asarray([1e-3]), jnp.asarray([10.0]))
    assert bool(occ[0])


def test_lt_t0_matches_t1(tmp_path):
    """splatFilmT0 (lens hits only) converges to the same image as the
    default splatFilmT1 — the reference's own cross-estimator oracle."""
    p = _dof_scene(str(tmp_path), lens_radius=0.5, depth=3)
    scene, meta = load_scene(p)
    img_t1 = np.asarray(render_light_tracer(scene, meta, chunk_size=4096,
                                            spp=400, strategy="t1"))
    img_t0 = np.asarray(render_light_tracer(scene, meta, chunk_size=4096,
                                            spp=4000, strategy="t0"))
    a = img_t1[9:, :, 0]
    b = img_t0[9:, :, 0]
    assert a.mean() > 0.01
    assert b.mean() > 0.0
    np.testing.assert_allclose(b.mean(), a.mean(), rtol=0.3)


def test_lt_s1_matches_t1(tmp_path):
    p = _dof_scene(str(tmp_path), lens_radius=0.2, depth=3)
    scene, meta = load_scene(p)
    img_t1 = np.asarray(render_light_tracer(scene, meta, chunk_size=4096,
                                            spp=400, strategy="t1"))
    img_s1 = np.asarray(render_light_tracer(scene, meta, chunk_size=4096,
                                            spp=400, strategy="s1"))
    a = img_t1[9:, :, 0]
    b = img_s1[9:, :, 0]
    assert a.mean() > 0.01 and b.mean() > 0.01
    np.testing.assert_allclose(b.mean(), a.mean(), rtol=0.2)


def test_bdpt_t0_contributes_and_total_matches_pt(tmp_path):
    from goblin_tpu.integrators.bdpt import render_bdpt

    p = _dof_scene(str(tmp_path), lens_radius=0.4, depth=3,
                   extra_settings={"render_method": "bdpt"})
    scene, meta = load_scene(p)
    # t=0 isolated: finite, nonzero (lens-hit strategies exist now)
    pt0 = _dof_scene(str(tmp_path), lens_radius=0.4, depth=3,
                     extra_settings={"render_method": "bdpt",
                                     "debug_t": 0})
    scene0, meta0 = load_scene(pt0)
    img_t0 = np.asarray(render_bdpt(scene0, meta0, chunk_size=2048, spp=16))
    assert np.isfinite(img_t0).all()
    assert img_t0.sum() > 0.0
    # full BDPT vs PT on the DOF scene
    img_pt = np.asarray(common.render(scene, meta, make_path(meta), spp=32,
                                      chunk_size=2048))
    img_bd = np.asarray(render_bdpt(scene, meta, chunk_size=2048, spp=16))
    a = img_pt[9:, :, 0]
    b = img_bd[9:, :, 0]
    assert a.mean() > 0.01
    np.testing.assert_allclose(b.mean(), a.mean(), rtol=0.15)
