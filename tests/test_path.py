"""Path tracer correctness: analytic direct lighting, estimator
consistency (the reference's own verification method, SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

from goblin_tpu.integrators import common
from goblin_tpu.integrators.path import make_li as make_path
from goblin_tpu.integrators.whitted import make_li as make_whitted
from goblin_tpu.scene.loader import load_scene


def _write_plane(tmp_path):
    with open(os.path.join(tmp_path, "plane.obj"), "w") as f:
        f.write(
            "v -1 0 1\nv 1 0 1\nv -1 0 -1\nv 1 0 -1\n"
            "vn 0 1 0\nf 1//1 2//1 3//1\nf 3//1 2//1 4//1\n"
        )


def _scene(tmp_path, lights, materials=None, primitives=None, res=(16, 16),
           spp=4, depth=3, cam=None):
    doc = {
        "render_setting": {"render_method": "path_tracing",
                           "sample_per_pixel": spp, "max_ray_depth": depth},
        "camera": cam or {
            # straight down at the floor from y=2
            "position": [0, 2.0, 0],
            "euler": [90, 0, 0],
            "rotation_order": "xyz",
            "fov": 30.0,
            "film": {"resolution": list(res)},
            "filter": {"type": "box", "width": [0.5, 0.5]},
        },
        "geometries": [{"name": "floor", "type": "mesh", "file": "plane.obj"}],
        "textures": [
            {"format": "color", "name": "grey", "type": "constant",
             "color": [0.6, 0.6, 0.6]},
        ],
        "materials": materials or [
            {"name": "diffuse", "type": "lambert", "Kd": "grey"},
        ],
        "primitives": primitives or [
            {"type": "model", "name": "floor_m", "geometry": "floor",
             "material": "diffuse"},
            {"type": "instance", "name": "floor_i", "model": "floor_m",
             "scale": [50, 50, 50]},
        ],
        "lights": lights,
    }
    p = os.path.join(tmp_path, "scene.json")
    _write_plane(tmp_path)
    with open(p, "w") as f:
        json.dump(doc, f)
    return p


def test_point_light_analytic(tmp_path):
    # point light directly above the floor: L = (kd/pi) * I * cos / r^2
    I = 10.0
    h = 3.0
    scene, meta = load_scene(
        _scene(str(tmp_path), [{
            "name": "key", "type": "point", "intensity": [I, I, I],
            "position": [0.0, h, 0.0],
        }])
    )
    img = np.asarray(common.render(scene, meta, make_path(meta), spp=4,
                                   chunk_size=256))
    # center pixel looks at ~(0,0,0); light straight above -> cos=1, r=h
    expect = (0.6 / np.pi) * I / (h * h)
    np.testing.assert_allclose(img[8, 8], expect, rtol=0.02)
    assert np.isfinite(img).all()


def test_directional_light_analytic(tmp_path):
    scene, meta = load_scene(
        _scene(str(tmp_path), [{
            "name": "sun", "type": "directional",
            "radiance": [2.0, 2.0, 2.0],
            "direction": [0.0, -1.0, 0.0],
        }])
    )
    img = np.asarray(common.render(scene, meta, make_path(meta), spp=2,
                                   chunk_size=256))
    expect = (0.6 / np.pi) * 2.0  # cos = 1
    np.testing.assert_allclose(img[8, 8], expect, rtol=0.02)


def test_spot_light_cone(tmp_path):
    # spot aimed straight down, narrow cone: center lit, far edge dark
    scene, meta = load_scene(
        _scene(str(tmp_path), [{
            "name": "spot", "type": "spot", "intensity": [20, 20, 20],
            "position": [0, 4.0, 0], "direction": [0, -1, 0],
            "theta_max": 5.0, "falloff_start": 3.0,
        }], res=(32, 32))
    )
    img = np.asarray(common.render(scene, meta, make_path(meta), spp=2,
                                   chunk_size=512))
    assert img[16, 16, 0] > 0.1  # inside cone
    assert img[16, 2, 0] < 1e-3  # outside cone


def test_area_light_matches_far_field_approx(tmp_path):
    # small quad light far above: approx point source with I = Le * A / pi?
    # exact: L = (kd/pi) * Le * solidangle-ish; use the analytic form for
    # a small planar emitter: E = Le * A * cos_l * cos_s / r^2
    Le = 50.0
    h = 5.0
    side = 0.2  # plane scaled by 0.1 -> 0.2x0.2 quad, area 0.04
    scene, meta = load_scene(
        _scene(
            str(tmp_path),
            [{
                "name": "panel", "type": "area", "radiance": [Le, Le, Le],
                "geometry": "floor",
                "position": [0.0, h, 0.0],
                # flip so the plane's +y normal faces downward
                "euler": [180.0, 0.0, 0.0],
                "rotation_order": "xyz",
                "scale": [0.1, 0.1, 0.1],
            }],
            spp=64, depth=2,
        )
    )
    img = np.asarray(common.render(scene, meta, make_path(meta), spp=64,
                                   chunk_size=256))
    A = side * side
    expect = (0.6 / np.pi) * Le * A / (h * h)
    np.testing.assert_allclose(img[8, 8], expect, rtol=0.08)


def test_pt_whitted_agree_direct_only(tmp_path):
    # diffuse scene + delta light: PT and Whitted must agree exactly in
    # the converged limit (estimator consistency oracle)
    path = _scene(str(tmp_path), [{
        "name": "key", "type": "point", "intensity": [15, 15, 15],
        "position": [1.0, 3.0, 0.5],
    }])
    scene, meta = load_scene(path)
    img_pt = np.asarray(common.render(scene, meta, make_path(meta), spp=4,
                                      chunk_size=256))
    img_wh = np.asarray(common.render(scene, meta, make_whitted(meta), spp=4,
                                      chunk_size=256))
    np.testing.assert_allclose(img_pt, img_wh, rtol=1e-4, atol=1e-6)


def test_env_light_furnace_single_bounce(tmp_path):
    # constant env map, no geometry hit for most rays -> image == env;
    # floor pixels get one-bounce approx of kd * 1 (with depth-limited
    # loss). Check the sky pixels equal the env radiance exactly.
    import numpy as np
    from goblin_tpu.io.exr import write_exr

    env = np.full((8, 16, 3), 1.5, np.float32)
    write_exr(os.path.join(str(tmp_path), "env.exr"), env)
    cam = {
        "position": [0, 1.0, 0],
        "euler": [-30, 0, 0],  # look up at the sky
        "rotation_order": "xyz",
        "fov": 40.0,
        "film": {"resolution": [8, 8]},
        "filter": {"type": "box", "width": [0.5, 0.5]},
    }
    p = _scene(str(tmp_path), [{
        "name": "env", "type": "ibl", "file": "env.exr",
    }], cam=cam, spp=1, depth=2)
    scene, meta = load_scene(p)
    assert meta.has_env
    img = np.asarray(common.render(scene, meta, make_path(meta), spp=1,
                                   chunk_size=64))
    np.testing.assert_allclose(img, 1.5, rtol=1e-4)


def test_two_seed_consistency(tmp_path):
    # same scene, different seeds -> independent estimates agree within MC
    # noise (consistency between independent estimators)
    path = _scene(str(tmp_path), [{
        "name": "panel", "type": "area", "radiance": [20, 20, 20],
        "geometry": "floor", "position": [0.5, 3.0, 0.0],
        "euler": [180.0, 0.0, 0.0], "scale": [0.3, 0.3, 0.3],
    }], depth=3)
    scene, meta = load_scene(path)
    li = make_path(meta)
    a = np.asarray(common.render(scene, meta, li, spp=32, seed=1,
                                 chunk_size=256))
    b = np.asarray(common.render(scene, meta, li, spp=32, seed=2,
                                 chunk_size=256))
    denom = np.maximum(a.mean(), 1e-6)
    assert abs(a.mean() - b.mean()) / denom < 0.05


def test_whitted_area_light_sample_num_matches_pt(tmp_path):
    """Per-light sample_num NEE (reference multiSampleLd loops samplesNum
    per light, GoblinRenderer.cpp:474-500) + the bsdf-sample MIS side of
    estimateLd: Whitted's direct lighting on an area-light scene must
    match the converged PT estimate, and sample_num=4 must reduce
    variance vs sample_num=1 at equal spp."""
    def scene_for(sn):
        return _scene(str(tmp_path), [{
            "name": "panel", "type": "area", "radiance": [20, 20, 20],
            "geometry": "floor", "position": [0.3, 2.5, 0.0],
            "euler": [180.0, 0.0, 0.0], "scale": [0.4, 0.4, 0.4],
            "sample_num": sn,
        }], spp=4, depth=2)

    scene, meta = load_scene(scene_for(4))
    assert meta.light_sample_nums == (4,)
    img_pt = np.asarray(common.render(scene, meta, make_path(meta), spp=64,
                                      chunk_size=256))
    img_wh = np.asarray(common.render(scene, meta, make_whitted(meta), spp=8,
                                      chunk_size=256))
    np.testing.assert_allclose(img_wh.mean(), img_pt.mean(), rtol=0.05)

    # variance: sample_num=4 at spp=2 vs sample_num=1 at spp=2, measured
    # against a converged reference
    scene1, meta1 = load_scene(scene_for(1))
    ref = img_pt
    wh4 = np.asarray(common.render(scene, meta, make_whitted(meta), spp=2,
                                   chunk_size=256))
    wh1 = np.asarray(common.render(scene1, meta1, make_whitted(meta1), spp=2,
                                   chunk_size=256))
    err4 = np.mean((wh4 - ref) ** 2)
    err1 = np.mean((wh1 - ref) ** 2)
    assert err4 < err1


def test_whitted_tree_vs_stochastic_glass(tmp_path):
    """The deterministic reflect+refract ray tree (reference
    GoblinWhitted.cpp:33-38) vs the stochastic one-branch fallback on a
    glass sphere: at 1 spp the tree is noise-free on specular pixels
    (same estimator as the reference), while Fresnel-picking one branch
    visibly differs sample-to-sample. Both must agree when converged."""
    import os as _os

    mats = [
        {"name": "diffuse", "type": "lambert", "Kd": "grey"},
        {"name": "glass", "type": "transparent", "Kr": "grey",
         "Kt": "grey", "index": 1.5},
    ]
    prims = [
        {"type": "model", "name": "floor_m", "geometry": "floor",
         "material": "diffuse"},
        {"type": "instance", "name": "floor_i", "model": "floor_m",
         "scale": [50, 50, 50]},
        {"type": "model", "name": "ball_m", "geometry": "ball",
         "material": "glass"},
        {"type": "instance", "name": "ball_i", "model": "ball_m",
         "position": [0, 0.7, 0]},
    ]
    path = _scene(str(tmp_path), [{
        "name": "key", "type": "point", "intensity": [30, 30, 30],
        "position": [1.5, 4.0, 0.5],
    }], materials=mats, primitives=prims, res=(24, 24), depth=3)
    # register the sphere geometry in the written json
    with open(path) as f:
        doc = json.load(f)
    doc["geometries"].append(
        {"name": "ball", "type": "sphere", "radius": 0.5})
    with open(path, "w") as f:
        json.dump(doc, f)

    def render_with(tree, spp, seed=0):
        _os.environ["GOBLIN_WHITTED_TREE"] = "1" if tree else "0"
        try:
            scene, meta = load_scene(path)
            return np.asarray(common.render(
                scene, meta, make_whitted(meta), spp=spp, seed=seed,
                chunk_size=576))
        finally:
            _os.environ.pop("GOBLIN_WHITTED_TREE", None)

    ref = render_with(True, 64)
    tree1 = render_with(True, 1, seed=5)
    sto1 = render_with(False, 1, seed=5)
    # the glass pixels: where the two 1-spp estimators disagree at all
    diff_ts = np.abs(tree1 - sto1).max()
    assert diff_ts > 1e-3, "one-branch sampling should visibly differ"
    err_tree = np.abs(tree1 - ref).mean()
    err_sto = np.abs(sto1 - ref).mean()
    # deterministic tree at 1 spp is strictly closer to converged
    assert err_tree < 0.7 * err_sto, (err_tree, err_sto)
    # and both estimators agree when converged
    sto64 = render_with(False, 64)
    np.testing.assert_allclose(sto64.mean(), ref.mean(), rtol=0.05)
