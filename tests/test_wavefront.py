"""Regenerative wavefront PT vs the chunked scan driver: identical
estimator (same hash-keyed sample streams per (pixel, s_idx, bounce)),
so the images must agree to float tolerance."""

import json
import os

import numpy as np
import pytest

from goblin_tpu.integrators import common
from goblin_tpu.integrators.path import make_li as make_path
from goblin_tpu.integrators.wavefront import render_wavefront
from goblin_tpu.scene.loader import load_scene


def _scene(tmp_path, lights, depth=3, res=(24, 18), extra=None):
    settings = {"render_method": "path_tracing", "sample_per_pixel": 4,
                "max_ray_depth": depth}
    doc = {
        "render_setting": settings,
        "camera": {
            "position": [0, 1.5, -2.5], "euler": [20, 0, 0],
            "rotation_order": "xyz", "fov": 45.0,
            "film": {"resolution": list(res)},
            "filter": {"type": "gaussian", "width": [2, 2]},
        },
        "geometries": [
            {"name": "floor", "type": "mesh", "file": "plane.obj"},
            {"name": "ball", "type": "sphere", "radius": 0.4},
        ],
        "textures": [
            {"format": "color", "name": "grey", "type": "constant",
             "color": [0.7, 0.7, 0.7]},
            {"format": "color", "name": "white", "type": "constant",
             "color": [1, 1, 1]},
        ],
        "materials": [
            {"name": "diffuse", "type": "lambert", "Kd": "grey"},
            {"name": "glass", "type": "transparent", "Kr": "white",
             "Kt": "white", "index": 1.5},
        ],
        "primitives": [
            {"type": "model", "name": "fm", "geometry": "floor",
             "material": "diffuse"},
            {"type": "instance", "name": "fi", "model": "fm",
             "scale": [30, 30, 30]},
            {"type": "model", "name": "bm", "geometry": "ball",
             "material": "glass"},
            {"type": "instance", "name": "bi", "model": "bm",
             "position": [0.0, 0.5, 0.0]},
        ],
        "lights": lights,
    }
    if extra:
        doc.update(extra)
    with open(os.path.join(tmp_path, "plane.obj"), "w") as f:
        f.write(
            "v -1 0 1\nv 1 0 1\nv -1 0 -1\nv 1 0 -1\n"
            "vn 0 1 0\nf 1//1 2//1 3//1\nf 3//1 2//1 4//1\n"
        )
    p = os.path.join(tmp_path, "scene.json")
    with open(p, "w") as f:
        json.dump(doc, f)
    return p


POINT = {"name": "key", "type": "point", "intensity": [10, 10, 10],
         "position": [0.6, 2.5, -0.3]}
AREA = {"name": "panel", "type": "area", "radiance": [25, 25, 25],
        "geometry": "floor", "position": [0.0, 2.2, 0.2],
        "euler": [180.0, 0.0, 0.0], "scale": [0.35, 0.35, 0.35]}


def test_wavefront_matches_chunked_point(tmp_path):
    p = _scene(str(tmp_path), [POINT], depth=4)
    scene, meta = load_scene(p)
    img_a = np.asarray(common.render(scene, meta, make_path(meta), spp=4,
                                     chunk_size=512))
    img_b = np.asarray(render_wavefront(scene, meta, spp=4, pool=1024))
    np.testing.assert_allclose(img_b, img_a, rtol=2e-4, atol=2e-5)


def test_wavefront_matches_chunked_area(tmp_path):
    p = _scene(str(tmp_path), [AREA, POINT], depth=3)
    scene, meta = load_scene(p)
    img_a = np.asarray(common.render(scene, meta, make_path(meta), spp=4,
                                     chunk_size=512))
    img_b, stats = render_wavefront(scene, meta, spp=4, pool=1024,
                                    with_stats=True)
    img_b = np.asarray(img_b)
    np.testing.assert_allclose(img_b, img_a, rtol=2e-4, atol=2e-5)
    # regeneration keeps lanes busy: useful segments should be a large
    # fraction of traced lane-slots
    assert stats["useful_segments"] > 0
    assert stats["iterations"] > 0


def test_wavefront_matches_chunked_small_pool(tmp_path):
    """Pool smaller than the frame: many regeneration rounds."""
    p = _scene(str(tmp_path), [POINT], depth=3)
    scene, meta = load_scene(p)
    img_a = np.asarray(common.render(scene, meta, make_path(meta), spp=1,
                                     chunk_size=512))
    img_b = np.asarray(render_wavefront(scene, meta, spp=1, pool=128))
    np.testing.assert_allclose(img_b, img_a, rtol=2e-4, atol=2e-5)
