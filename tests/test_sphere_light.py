"""Sphere-geometry area lights: cone-sampled NEE (reference
GoblinSphere.cpp:108-150 via GeometrySet/AreaLight)."""

import json
import os

import jax.numpy as jnp
import numpy as np

from goblin_tpu.lights import lights as lt
from goblin_tpu.scene.loader import load_scene


def _scene(tmp_path):
    doc = {
        "render_setting": {"render_method": "path_tracing",
                           "sample_per_pixel": 1, "max_ray_depth": 2},
        "camera": {
            "position": [0, 0, -4.0], "fov": 45.0,
            "film": {"resolution": [16, 12]},
            "filter": {"type": "box", "width": [0.5, 0.5]},
        },
        "geometries": [
            {"name": "floor", "type": "mesh", "file": "plane.obj"},
            {"name": "bulb", "type": "sphere", "radius": 0.5},
        ],
        "textures": [
            {"format": "color", "name": "white", "type": "constant",
             "color": [0.8, 0.8, 0.8]},
        ],
        "materials": [
            {"name": "diffuse", "type": "lambert", "Kd": "white"},
        ],
        "primitives": [
            {"type": "model", "name": "fm", "geometry": "floor",
             "material": "diffuse"},
            {"type": "instance", "name": "fi", "model": "fm",
             "scale": [10, 10, 10]},
        ],
        "lights": [
            {"name": "ball", "type": "area", "radiance": [3, 3, 3],
             "geometry": "bulb", "position": [0, 2, 0]},
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
    return load_scene(p)


def test_sphere_light_baked(tmp_path):
    scene, meta = _scene(str(tmp_path))
    lights = scene["lights"]
    assert bool(lights["is_sphere"][0])
    np.testing.assert_allclose(
        float(lights["area"][0]), 4 * np.pi * 0.25, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(lights["sph_center"][0]), [0, 2, 0], atol=1e-6
    )


def test_sphere_light_nee_matches_analytic(tmp_path):
    """MC irradiance below the sphere == Le * pi * r^2 / d^2 (radiance Le
    seen under the cone, cosine-weighted with the receiver normal facing
    the center)."""
    scene, meta = _scene(str(tmp_path))
    lights = scene["lights"]
    tri_data = {
        "em_v0": scene["em_v0"], "em_e1": scene["em_e1"],
        "em_e2": scene["em_e2"], "em_n": scene["em_n"],
    }
    R = 1 << 14
    rng = np.random.default_rng(7)
    u1 = jnp.asarray(rng.uniform(size=R).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=R).astype(np.float32))
    p = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0]), (R, 3))
    lid = jnp.zeros(R, jnp.int32)
    ls = lt.sample_li(lights, tri_data, lid, p, 1e-4, u1, u2)
    nrm = jnp.asarray([0.0, 1.0, 0.0])
    cos_r = jnp.maximum(jnp.sum(ls["wi"] * nrm, -1), 0.0)
    est = np.asarray(
        (ls["Li"] * (cos_r / jnp.maximum(ls["pdf"], 1e-20))[..., None])
    ).mean(axis=0)
    d, r, Le = 2.0, 0.5, 3.0
    want = Le * np.pi * r * r / (d * d)
    np.testing.assert_allclose(est, want, rtol=0.02)
    # pdf must be the cone pdf for an outside receiver
    sin2max = r * r / (d * d)
    cone_pdf = 1.0 / (2 * np.pi * (1 - np.sqrt(1 - sin2max)))
    np.testing.assert_allclose(np.asarray(ls["pdf"]), cone_pdf, rtol=1e-4)


def test_sphere_light_end_to_end(tmp_path):
    """Floor lit only by an emissive sphere renders nonzero (pre-fix this
    was exactly the 'emissive sphere yields zero NEE' gap)."""
    from goblin_tpu.integrators import common
    from goblin_tpu.integrators.path import make_li

    scene, meta = _scene(str(tmp_path))
    img = np.asarray(common.render(scene, meta, make_li(meta), spp=1,
                                   seed=0))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3
