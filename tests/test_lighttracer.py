"""Light tracer vs path tracer estimator consistency (the reference's own
correctness oracle: different estimators converge to the same image)."""

import json
import os

import numpy as np
import pytest

from goblin_tpu.integrators import common
from goblin_tpu.integrators.path import make_li as make_path
from goblin_tpu.scene.loader import load_scene
from goblin_tpu.splatting import render_light_tracer


def _scene(tmp_path, light, spp=4, depth=3, res=(24, 18)):
    doc = {
        "render_setting": {"render_method": "light_tracing",
                           "sample_per_pixel": spp, "max_ray_depth": depth},
        "camera": {
            "position": [0, 1.5, -2.5],
            "euler": [20, 0, 0],
            "rotation_order": "xyz",
            "fov": 45.0,
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
        "lights": [light],
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


def test_lt_matches_pt_point_light(tmp_path):
    p = _scene(str(tmp_path), {
        "name": "key", "type": "point", "intensity": [12, 12, 12],
        "position": [0.5, 3.0, 0.0],
    }, depth=2)
    scene, meta = load_scene(p)
    img_pt = np.asarray(common.render(scene, meta, make_path(meta), spp=8,
                                      chunk_size=512))
    img_lt = np.asarray(render_light_tracer(scene, meta, chunk_size=2048,
                                            spp=600))
    # compare on the floor region (bottom half), mean brightness
    a = img_pt[9:, :, 0]
    b = img_lt[9:, :, 0]
    assert a.mean() > 0.01
    np.testing.assert_allclose(b.mean(), a.mean(), rtol=0.1)
    # spatial correlation: brighter near the light for both
    corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
    assert corr > 0.7


def test_lt_matches_pt_area_light(tmp_path):
    p = _scene(str(tmp_path), {
        "name": "panel", "type": "area", "radiance": [30, 30, 30],
        "geometry": "floor", "position": [0.0, 2.5, 0.0],
        "euler": [180.0, 0.0, 0.0], "scale": [0.4, 0.4, 0.4],
    }, depth=3)
    scene, meta = load_scene(p)
    img_pt = np.asarray(common.render(scene, meta, make_path(meta), spp=32,
                                      chunk_size=512))
    img_lt = np.asarray(render_light_tracer(scene, meta, chunk_size=2048,
                                            spp=1500))
    a = img_pt[9:, :, 0]
    b = img_lt[9:, :, 0]
    assert a.mean() > 0.01
    np.testing.assert_allclose(b.mean(), a.mean(), rtol=0.15)


def test_lt_matches_pt_env_light(tmp_path):
    """IBL emission side (samplePosition on the world bounding sphere +
    cosine direction, reference src/GoblinLight.cpp:557-583): a scene
    whose ONLY light is an EXR environment map must agree between the
    path tracer (view-side env sampling) and the light tracer (emission-
    side walk from the bounding sphere)."""
    from goblin_tpu.io.exr import write_exr

    # smooth anisotropic sky: brighter toward +y, blue-ish horizon
    h, w = 16, 32
    ys = np.linspace(0, np.pi, h)[:, None]
    img = np.stack(
        [
            0.6 + 0.4 * np.cos(ys) * np.ones((h, w)),
            0.5 + 0.3 * np.cos(ys) * np.ones((h, w)),
            0.8 * np.ones((h, w)),
        ],
        axis=-1,
    ).astype(np.float32)
    write_exr(os.path.join(str(tmp_path), "sky.exr"), img)
    p = _scene(str(tmp_path), {
        "name": "sky", "type": "ibl", "file": "sky.exr",
    }, depth=2)
    scene, meta = load_scene(p)
    img_pt = np.asarray(common.render(scene, meta, make_path(meta), spp=16,
                                      chunk_size=512))
    img_lt = np.asarray(render_light_tracer(scene, meta, chunk_size=2048,
                                            spp=1200))
    # floor region: lit by the env only. LT has no env-miss Le for camera
    # rays (paths must connect through the scene), so compare the lit
    # floor rather than the sky pixels.
    a = img_pt[9:, :, :].mean(axis=-1)
    b = img_lt[9:, :, :].mean(axis=-1)
    assert a.mean() > 0.01
    np.testing.assert_allclose(b.mean(), a.mean(), rtol=0.15)


def test_bdpt_matches_pt_env_light(tmp_path):
    from goblin_tpu.integrators.bdpt import render_bdpt
    from goblin_tpu.io.exr import write_exr

    h, w = 16, 32
    ys = np.linspace(0, np.pi, h)[:, None]
    img = np.stack(
        [
            0.6 + 0.4 * np.cos(ys) * np.ones((h, w)),
            0.5 + 0.3 * np.cos(ys) * np.ones((h, w)),
            0.8 * np.ones((h, w)),
        ],
        axis=-1,
    ).astype(np.float32)
    write_exr(os.path.join(str(tmp_path), "sky.exr"), img)
    p = _scene(str(tmp_path), {
        "name": "sky", "type": "ibl", "file": "sky.exr",
    }, depth=2)
    scene, meta = load_scene(p)
    img_pt = np.asarray(common.render(scene, meta, make_path(meta), spp=16,
                                      chunk_size=512))
    img_bd = np.asarray(render_bdpt(scene, meta, chunk_size=512, spp=16))
    a = img_pt[9:, :, :].mean(axis=-1)
    b = img_bd[9:, :, :].mean(axis=-1)
    assert a.mean() > 0.01
    np.testing.assert_allclose(b.mean(), a.mean(), rtol=0.15)
