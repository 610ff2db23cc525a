"""End-to-end: scene loading + AO render on small scenes."""

import json
import os

import numpy as np
import pytest

from goblin_tpu.assets import ensure_bunny_obj
from goblin_tpu.integrators import common
from goblin_tpu.integrators.ao import make_li as make_ao
from goblin_tpu.scene.loader import load_scene

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _tiny_scene(tmp_path, extra=None, res=(32, 24), method="ao", spp=1):
    doc = {
        "render_setting": {
            "render_method": method,
            "sample_per_pixel": spp,
            "ao_sample_num": 4,
        },
        "camera": {
            "position": [0, 1.0, -3.0],
            "euler": [15, 0, 0],
            "rotation_order": "xyz",
            "fov": 50.0,
            "film": {"resolution": list(res)},
            "filter": {"type": "box", "width": [0.5, 0.5]},
        },
        "geometries": [
            {"name": "floor", "type": "mesh", "file": "plane.obj"},
            {"name": "ball", "type": "sphere", "radius": 0.5},
        ],
        "textures": [
            {"format": "color", "name": "white", "type": "constant",
             "color": [1, 1, 1]},
        ],
        "materials": [
            {"name": "diffuse", "type": "lambert", "Kd": "white"},
        ],
        "primitives": [
            {"type": "model", "name": "floor_m", "geometry": "floor",
             "material": "diffuse"},
            {"type": "model", "name": "ball_m", "geometry": "ball",
             "material": "diffuse"},
            {"type": "instance", "name": "floor_i", "model": "floor_m",
             "scale": [10, 10, 10]},
            {"type": "instance", "name": "ball_i", "model": "ball_m",
             "position": [0, 0.5, 0]},
        ],
        "lights": [
            {"name": "key", "type": "point", "intensity": [10, 10, 10],
             "position": [3, 4, -2]},
        ],
    }
    if extra:
        doc.update(extra)
    # write plane obj next to the scene
    with open(os.path.join(tmp_path, "plane.obj"), "w") as f:
        f.write(
            "v -1 0 1\nv 1 0 1\nv -1 0 -1\nv 1 0 -1\n"
            "vn 0 1 0\nf 1//1 2//1 3//1\nf 3//1 2//1 4//1\n"
        )
    p = os.path.join(tmp_path, "scene.json")
    with open(p, "w") as f:
        json.dump(doc, f)
    return p


def test_scene_loads_and_bakes(tmp_path):
    scene, meta = load_scene(_tiny_scene(str(tmp_path)))
    assert meta.n_tris >= 2
    assert meta.n_spheres == 1
    assert meta.n_lights == 1
    assert meta.camera.film.x_res == 32
    assert scene["tri_soup"].shape[1] == 9


def test_ao_render_end_to_end(tmp_path):
    scene, meta = load_scene(_tiny_scene(str(tmp_path)))
    li = make_ao(4)
    img = np.asarray(common.render(scene, meta, li, spp=1, chunk_size=256))
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()
    # sky misses -> 0, open floor -> bright, contact region under the
    # sphere -> noticeably darker than open floor
    assert img.max() > 0.8
    # center-bottom sees the floor near the sphere
    lower = img[18:, 12:20, 0]
    assert lower.mean() > 0.1


def test_ao_sphere_occludes_floor(tmp_path):
    scene, meta = load_scene(_tiny_scene(str(tmp_path)))
    li = make_ao(16)
    img = np.asarray(common.render(scene, meta, li, spp=2, chunk_size=512))
    # floor right under the sphere is darker than the floor far away
    # find rows: bottom half is floor
    near = img[20, 16, 0]  # roughly under the sphere
    far = img[23, 2, 0]
    assert near < far


def test_bunny_scene_loads():
    ensure_bunny_obj(os.path.join(EXAMPLES, "models", "bunny.obj"))
    scene, meta = load_scene(
        os.path.join(EXAMPLES, "bunny.json"),
        overrides={"render_method": "ao"},
    )
    assert meta.n_tris > 10_000
    assert meta.camera.film.x_res == 512
    assert meta.settings["render_method"] == "ao"
    assert meta.n_lights == 1
