"""BDPT vs PT estimator consistency + strategy isolation toggles."""

import json
import os

import numpy as np
import pytest

from goblin_tpu.integrators import common
from goblin_tpu.integrators.bdpt import render_bdpt
from goblin_tpu.integrators.path import make_li as make_path
from goblin_tpu.scene.loader import load_scene


def _scene(tmp_path, lights, spp=16, depth=3, res=(20, 16), extra_settings=None):
    settings = {"render_method": "bdpt", "sample_per_pixel": spp,
                "max_ray_depth": depth}
    if extra_settings:
        settings.update(extra_settings)
    doc = {
        "render_setting": settings,
        "camera": {
            "position": [0, 1.4, -2.4],
            "euler": [20, 0, 0],
            "rotation_order": "xyz",
            "fov": 48.0,
            "film": {"resolution": list(res)},
            "filter": {"type": "box", "width": [0.5, 0.5]},
        },
        "geometries": [{"name": "floor", "type": "mesh", "file": "plane.obj"}],
        "textures": [
            {"format": "color", "name": "grey", "type": "constant",
             "color": [0.65, 0.65, 0.65]},
        ],
        "materials": [{"name": "diffuse", "type": "lambert", "Kd": "grey"}],
        "primitives": [
            {"type": "model", "name": "fm", "geometry": "floor",
             "material": "diffuse"},
            {"type": "instance", "name": "fi", "model": "fm",
             "scale": [30, 30, 30]},
        ],
        "lights": lights,
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


AREA_LIGHT = {
    "name": "panel", "type": "area", "radiance": [25, 25, 25],
    "geometry": "floor", "position": [0.0, 2.2, 0.2],
    "euler": [180.0, 0.0, 0.0], "scale": [0.35, 0.35, 0.35],
}
POINT_LIGHT = {
    "name": "key", "type": "point", "intensity": [10, 10, 10],
    "position": [0.6, 2.5, -0.3],
}


def test_bdpt_matches_pt_area_light(tmp_path):
    p = _scene(str(tmp_path), [AREA_LIGHT], depth=3)
    scene, meta = load_scene(p)
    img_pt = np.asarray(common.render(scene, meta, make_path(meta), spp=32,
                                      chunk_size=512))
    img_bd = np.asarray(render_bdpt(scene, meta, chunk_size=512, spp=16))
    assert np.isfinite(img_bd).all()
    a = img_pt[..., 0]
    b = img_bd[..., 0]
    assert a.mean() > 0.01 and b.mean() > 0.01
    np.testing.assert_allclose(b.mean(), a.mean(), rtol=0.15)
    corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
    assert corr > 0.8


def test_bdpt_matches_pt_point_light(tmp_path):
    p = _scene(str(tmp_path), [POINT_LIGHT], depth=3)
    scene, meta = load_scene(p)
    img_pt = np.asarray(common.render(scene, meta, make_path(meta), spp=16,
                                      chunk_size=512))
    img_bd = np.asarray(render_bdpt(scene, meta, chunk_size=512, spp=16))
    a = img_pt[..., 0]
    b = img_bd[..., 0]
    assert a.mean() > 0.005
    np.testing.assert_allclose(b.mean(), a.mean(), rtol=0.15)


def test_bdpt_strategy_isolation_sums_to_full(tmp_path):
    # with MIS weights, the sum over all strategies equals the full
    # estimate; isolating s=1 (NEE-like) must reproduce a meaningful
    # subset (positive, less than full)
    p_full = _scene(str(tmp_path), [AREA_LIGHT], depth=2)
    scene, meta = load_scene(p_full)
    img_full = np.asarray(render_bdpt(scene, meta, chunk_size=512, spp=16))

    parts = []
    for s in range(0, 3):
        ps = _scene(str(tmp_path), [AREA_LIGHT], depth=2,
                    extra_settings={"debug_s": s})
        scene_s, meta_s = load_scene(ps)
        parts.append(np.asarray(render_bdpt(scene_s, meta_s, chunk_size=512,
                                            spp=16)))
    assert parts[0].mean() > 0  # eye path hits the light directly
    assert parts[1].mean() > 0  # NEE-style connections
    # MIS-weighted strategies partition the full estimate
    total = sum(p.mean() for p in parts)
    np.testing.assert_allclose(total, img_full.mean(), rtol=0.1)
