"""Index-matched (BSDF_NULL) punch-through on shadow rays: mask surfaces
attenuate instead of occluding and never consume path depth (reference
isOpaque filter + evalAttenuation, src/GoblinPathtracer.cpp:5-48)."""

import json
import os

import numpy as np

from goblin_tpu.integrators import common
from goblin_tpu.integrators.path import make_li
from goblin_tpu.scene.loader import load_scene


def _scene(tmp_path, alpha):
    """Floor below, mask panel between the floor and a point light."""
    doc = {
        "render_setting": {"render_method": "path_tracing",
                           "sample_per_pixel": 1, "max_ray_depth": 2},
        "camera": {
            "position": [0, 1.0, -3.0], "euler": [15, 0, 0],
            "rotation_order": "xyz", "fov": 50.0,
            "film": {"resolution": [24, 16]},
            "filter": {"type": "box", "width": [0.5, 0.5]},
        },
        "geometries": [
            {"name": "plane", "type": "mesh", "file": "plane.obj"},
        ],
        "textures": [
            {"format": "color", "name": "white", "type": "constant",
             "color": [0.8, 0.8, 0.8]},
            {"format": "float", "name": "a", "type": "constant",
             "float": alpha},
        ],
        "materials": [
            {"name": "diffuse", "type": "lambert", "Kd": "white"},
            {"name": "veil", "type": "mask", "alpha": "a",
             "material": "diffuse", "transparent_color": [1, 1, 1]},
        ],
        "primitives": [
            {"type": "model", "name": "fm", "geometry": "plane",
             "material": "diffuse"},
            {"type": "model", "name": "vm", "geometry": "plane",
             "material": "veil"},
            {"type": "instance", "name": "fi", "model": "fm",
             "scale": [10, 10, 10]},
            {"type": "instance", "name": "vi", "model": "vm",
             "position": [0, 2.0, 0], "scale": [10, 10, 10]},
        ],
        "lights": [
            {"name": "key", "type": "point", "intensity": [30, 30, 30],
             "position": [0, 4.0, 0]},
        ],
    }
    with open(os.path.join(tmp_path, "plane.obj"), "w") as f:
        f.write(
            "v -1 0 1\nv 1 0 1\nv -1 0 -1\nv 1 0 -1\n"
            "vn 0 1 0\nf 1//1 2//1 3//1\nf 3//1 2//1 4//1\n"
        )
    p = os.path.join(tmp_path, f"scene_{alpha}.json")
    with open(p, "w") as f:
        json.dump(doc, f)
    return load_scene(p)


def _floor_mean(scene, meta):
    img = np.asarray(common.render(scene, meta, make_li(meta), spp=1,
                                   seed=0))
    assert np.isfinite(img).all()
    return img[10:, :, :].mean()  # bottom rows look at the floor


def test_mask_shadow_attenuates_not_blocks(tmp_path):
    lit = []
    for alpha in (0.0, 0.5, 1.0):
        scene, meta = _scene(str(tmp_path), alpha)
        assert meta.has_null
        lit.append(_floor_mean(scene, meta))
    # alpha=0: fully transparent veil -> floor fully lit through it at
    # depth 2 (punch-through costs no bounce); alpha=1: opaque -> shadow
    assert lit[0] > 5 * max(lit[2], 1e-5), (
        f"transparent mask should not shadow: {lit}"
    )
    # half alpha sits between
    assert lit[2] < lit[1] < lit[0], f"attenuation not monotone: {lit}"
