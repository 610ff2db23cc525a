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
