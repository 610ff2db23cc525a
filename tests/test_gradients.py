"""Differentiable-rendering acceptance: pixel gradients vs central finite
differences (BASELINE.md: gradients allclose vs FD for material / light /
vertex parameters).

The reference has no differentiable counterpart; the oracle is FD on the
same jitted radiance function, perturbing scene pytree leaves:
- lights.color      (light intensity/radiance)
- tex_const         (constant-texture material params, e.g. lambert Kd)
- tri_soup          (world-space vertex positions — flows through the
                     differentiable Moller-Trumbore hit recompute in
                     scene/intersect.py; the traversal's discrete triangle
                     pick stays detached)
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goblin_tpu.integrators import common
from goblin_tpu.integrators.path import make_li as make_path
from goblin_tpu.scene.loader import load_scene


def _write_plane(tmp_path):
    with open(os.path.join(tmp_path, "plane.obj"), "w") as f:
        f.write(
            "v -1 0 1\nv 1 0 1\nv -1 0 -1\nv 1 0 -1\n"
            "vn 0 1 0\nf 1//1 2//1 3//1\nf 3//1 2//1 4//1\n"
        )


def _scene(tmp_path):
    doc = {
        "render_setting": {"render_method": "path_tracing",
                           "sample_per_pixel": 1, "max_ray_depth": 3},
        "camera": {
            "position": [0, 2.0, 0],
            "euler": [90, 0, 0],
            "rotation_order": "xyz",
            "fov": 30.0,
            "film": {"resolution": [8, 8]},
            "filter": {"type": "box", "width": [0.5, 0.5]},
        },
        "geometries": [{"name": "floor", "type": "mesh", "file": "plane.obj"}],
        "textures": [
            {"format": "color", "name": "red", "type": "constant",
             "color": [0.7, 0.3, 0.2]},
        ],
        "materials": [{"name": "diffuse", "type": "lambert", "Kd": "red"}],
        "primitives": [
            {"type": "model", "name": "floor_m", "geometry": "floor",
             "material": "diffuse"},
            {"type": "instance", "name": "floor_i", "model": "floor_m",
             "scale": [50, 50, 50]},
        ],
        "lights": [
            {"type": "point", "name": "key", "position": [0.5, 3.0, 0.2],
             "intensity": [11.0, 10.0, 9.0]},
        ],
    }
    p = os.path.join(tmp_path, "scene.json")
    _write_plane(tmp_path)
    with open(p, "w") as f:
        json.dump(doc, f)
    return p


@pytest.fixture(scope="module")
def loss_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("grad")
    scene, meta = load_scene(_scene(tmp))
    li = make_path(meta)
    cam = meta.camera
    spec = cam.film
    pixel_ids = jnp.arange(spec.x_res * spec.y_res, dtype=jnp.int32)

    @jax.jit
    def loss(scene):
        x, y = common.pixel_samples(0, pixel_ids, spec.x_res, jnp.int32(0), 1)
        ray = cam.generate_ray(x, y)
        L = li(scene, meta, ray, pixel_ids, jnp.int32(0), 0)
        # weighted mean so per-channel gradients differ
        w = jnp.asarray([1.0, 2.0, 3.0])
        return jnp.mean(L * w)

    return scene, loss


def _fd(loss, scene, path_key, idx, eps):
    """Central finite difference of loss w.r.t. scene[path_key][idx]."""
    def with_val(v):
        sc = dict(scene)
        if path_key == ("lights", "color"):
            sc["lights"] = dict(scene["lights"])
            sc["lights"]["color"] = scene["lights"]["color"].at[idx].set(v)
        else:
            sc[path_key] = scene[path_key].at[idx].set(v)
        return sc

    base = (scene["lights"]["color"] if path_key == ("lights", "color")
            else scene[path_key])[idx]
    lp = loss(with_val(base + eps))
    lm = loss(with_val(base - eps))
    return (lp - lm) / (2 * eps)


def test_grad_light_color_vs_fd(loss_env):
    scene, loss = loss_env
    g = jax.grad(lambda lc: loss(
        {**scene, "lights": {**scene["lights"], "color": lc}}
    ))(scene["lights"]["color"])
    g = np.asarray(g)
    assert np.any(np.abs(g) > 1e-6), "light-color gradient is identically zero"
    for idx in [(0, 0), (0, 1), (0, 2)]:
        fd = float(_fd(loss, scene, ("lights", "color"), idx, 1e-2))
        assert np.isfinite(fd)
        assert g[idx] == pytest.approx(fd, rel=2e-3, abs=1e-7), idx


def test_grad_material_kd_vs_fd(loss_env):
    scene, loss = loss_env
    g = jax.grad(lambda tc: loss({**scene, "tex_const": tc}))(
        scene["tex_const"]
    )
    g = np.asarray(g)
    assert np.any(np.abs(g) > 1e-6), "Kd gradient is identically zero"
    # row 1 is the "red" constant texture (row 0 = error magenta)
    for idx in [(1, 0), (1, 1), (1, 2)]:
        fd = float(_fd(loss, scene, "tex_const", idx, 1e-3))
        assert g[idx] == pytest.approx(fd, rel=2e-3, abs=1e-7), idx


def test_grad_vertex_positions_vs_fd(loss_env):
    scene, loss = loss_env
    g = jax.grad(lambda ts: loss({**scene, "tri_soup": ts}))(
        scene["tri_soup"]
    )
    g = np.asarray(g)
    assert np.any(np.abs(g) > 1e-6), "vertex gradient is identically zero"
    # perturb v0.y (the packed soup layout is v0|e1|e2) of both floor
    # triangles: moving the floor toward the light changes the NEE
    # falloff smoothly (no visibility edge crosses the film)
    checked = 0
    for tri in range(min(2, g.shape[0])):
        idx = (tri, 1)  # v0.y
        if abs(g[idx]) < 1e-6:
            continue
        fd = float(_fd(loss, scene, "tri_soup", idx, 1e-3))
        assert g[idx] == pytest.approx(fd, rel=5e-2, abs=1e-6), idx
        checked += 1
    assert checked > 0, "no triangle had a nonzero v0.y gradient"


def test_grad_no_nan_through_bounce_scan(loss_env):
    """Full-scene gradient (all leaves at once) is finite — guards the
    stop_gradient placement around the traversal while_loop."""
    scene, loss = loss_env
    g = jax.grad(loss, allow_int=True)(scene)
    for leaf in jax.tree_util.tree_leaves(g):
        a = np.asarray(leaf)
        if np.issubdtype(a.dtype, np.floating):
            assert np.all(np.isfinite(a))
