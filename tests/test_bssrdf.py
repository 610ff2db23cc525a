"""BSSRDF: dipole Rd numerics, albedo inversion, end-to-end translucency.

Reference behaviors: BSSRDF::Rd / convertFromDiffuse / diffuseReflectance
(src/GoblinMaterial.cpp:39-219) and Renderer::Lsubsurface integration
(src/GoblinRenderer.cpp:128-294).
"""

import json
import os

import jax.numpy as jnp
import numpy as np

from goblin_tpu.shading.bssrdf import (
    convert_from_diffuse,
    diffuse_reflectance,
    fdr,
    fresnel_a,
    rd_dipole,
)


def test_fdr_continuity_and_range():
    # polynomial branches meet near eta=1 and produce sane reflectivity
    assert abs(fdr(1.0001) - fdr(0.9999)) < 0.02
    assert 0.0 < fdr(1.5) < 1.0


def test_convert_from_diffuse_roundtrip():
    """Bisection inverts diffuseReflectance: alpha' recovered from the
    converted sigmas reproduces the requested albedo."""
    A = fresnel_a(1.5)
    kd = np.array([0.2, 0.5, 0.8])
    mfp = np.array([1.0, 0.5, 2.0])
    sa, ssp = convert_from_diffuse(kd, mfp, A)
    assert (sa > 0).all() and (ssp > 0).all()
    alpha_prime = ssp / (sa + ssp)
    np.testing.assert_allclose(
        diffuse_reflectance(alpha_prime, A), kd, atol=1e-3
    )
    # sigma_tr of the converted medium matches 1/mean_free_path
    sigma_tr = np.sqrt(3.0 * sa * (sa + ssp))
    np.testing.assert_allclose(sigma_tr, 1.0 / mfp, rtol=1e-3)


def test_rd_dipole_formula():
    """rd_dipole matches an independent numpy transcription of the
    Donner 06 dipole at scattered radii."""
    sa = np.array([[0.0021, 0.0041, 0.0071]], np.float32)
    ssp = np.array([[2.19, 2.62, 3.00]], np.float32)
    A = np.array([fresnel_a(1.5)], np.float32)
    for d in (0.01, 0.1, 0.5):
        got = np.asarray(rd_dipole(jnp.asarray(sa), jnp.asarray(ssp),
                                   jnp.asarray(A), jnp.asarray([d * d])))
        stp = sa + ssp
        str_ = np.sqrt(3 * sa * stp)
        zr = 1.0 / stp
        zv = zr * (1 + 4.0 / 3.0 * A[0])
        dr = np.sqrt(zr ** 2 + d * d)
        dv = np.sqrt(zv ** 2 + d * d)
        want = (ssp / stp) / (4 * np.pi) * (
            zr * (1 + str_ * dr) * np.exp(-str_ * dr) / dr ** 3
            + zv * (1 + str_ * dv) * np.exp(-str_ * dv) / dv ** 3
        )
        np.testing.assert_allclose(got, want, rtol=1e-4)
    # monotone decreasing in distance
    r = np.asarray(rd_dipole(jnp.asarray(sa), jnp.asarray(ssp),
                             jnp.asarray(A),
                             jnp.asarray([0.01])))
    r2 = np.asarray(rd_dipole(jnp.asarray(sa), jnp.asarray(ssp),
                              jnp.asarray(A), jnp.asarray([1.0])))
    assert (r > r2).all()


def _ss_scene(tmp_path, method="path_tracing"):
    doc = {
        "render_setting": {"render_method": method, "sample_per_pixel": 1,
                           "max_ray_depth": 2, "bssrdf_sample_num": 2},
        "camera": {
            "position": [0, 0, -3.0], "fov": 45.0,
            "film": {"resolution": [24, 16]},
            "filter": {"type": "box", "width": [0.5, 0.5]},
        },
        "geometries": [
            {"name": "blob", "type": "sphere", "radius": 1.0},
        ],
        "textures": [],
        "materials": [
            {"name": "marble", "type": "subsurface", "index": 1.5},
        ],
        "primitives": [
            {"type": "model", "name": "bm", "geometry": "blob",
             "material": "marble"},
            {"type": "instance", "name": "bi", "model": "bm"},
        ],
        "lights": [
            {"name": "key", "type": "point", "intensity": [40, 40, 40],
             "position": [2, 2, -3]},
        ],
    }
    p = os.path.join(tmp_path, "scene.json")
    with open(p, "w") as f:
        json.dump(doc, f)
    return p


def test_subsurface_sphere_renders(tmp_path):
    """A marble sphere lit by a point light produces finite, nonzero
    radiance through the BSSRDF path (the surface lobe alone is a
    specular reflector that would be black almost everywhere)."""
    from goblin_tpu.integrators import common
    from goblin_tpu.integrators.path import make_li
    from goblin_tpu.scene.loader import load_scene

    scene, meta = load_scene(_ss_scene(str(tmp_path)))
    assert meta.has_bssrdf
    img = np.asarray(
        common.render(scene, meta, make_li(meta), spp=1, seed=0)
    )
    assert np.isfinite(img).all()
    # center pixels cover the sphere; subsurface glow must be nonzero
    c = img[4:12, 8:16]
    assert c.mean() > 1e-4, f"no subsurface contribution: mean={c.mean()}"


def test_subsurface_whitted_renders(tmp_path):
    from goblin_tpu.integrators import common
    from goblin_tpu.integrators.whitted import make_li
    from goblin_tpu.scene.loader import load_scene

    scene, meta = load_scene(_ss_scene(str(tmp_path), method="whitted"))
    img = np.asarray(
        common.render(scene, meta, make_li(meta), spp=1, seed=0)
    )
    assert np.isfinite(img).all()
    assert img[4:12, 8:16].mean() > 1e-4
