"""Area-light sampling must be *area-uniform* across multi-triangle
emitters (reference CDF1D remaps u within the sampled cell before the
barycentric warp, src/GoblinSampler.cpp:420-440 + GoblinLight.cpp:289-343).

Regression for the u1-reuse bias: picking a triangle with u1 against the
CDF and then feeding the raw u1 into uniform_sample_triangle (r=sqrt(u1))
confines barycentrics to a radial band per triangle. We recover (u1, u2)
from the sampled barycentrics by inverting the warp and chi2-test them
for uniformity on an 8x8 grid.
"""

import jax.numpy as jnp
import numpy as np

from goblin_tpu.core.rng import hash_uniform
from goblin_tpu.lights import lights as lt


def _two_triangle_light():
    """One area light over two very unequal triangles (areas 0.5, 4.5)."""
    build = lt.LightsBuild()
    build.add(lt.LIGHT_AREA, color=(1.0, 1.0, 1.0), area=5.0)
    em_tri_light = [0, 0]
    em_tri_area = [0.5, 4.5]
    lights = lt.bake_lights(
        build, em_tri_light, em_tri_area,
        world_center=(0, 0, 0), world_radius=10.0,
    )
    tri_data = {
        "em_rows": jnp.concatenate(
            [
                jnp.asarray([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]]),
                jnp.asarray([[1.0, 0.0, 0.0], [3.0, 0.0, 0.0]]),
                jnp.asarray([[0.0, 1.0, 0.0], [0.0, 3.0, 0.0]]),
                jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]]),
            ],
            axis=-1,
        )
    }
    return lights, tri_data


def _recover_uv(ps, v0s, e1_x, e2_y):
    """Invert p = v0 + bu*e1 + bv*e2 (axis-aligned e1/e2 here) then the
    triangle warp bu = 1 - sqrt(u1), bv = u2*sqrt(u1)."""
    bu = (ps[:, 0] - v0s[:, 0]) / e1_x
    bv = (ps[:, 1] - v0s[:, 1]) / e2_y
    r = 1.0 - bu
    u1 = r * r
    u2 = np.where(r > 1e-9, bv / np.maximum(r, 1e-9), 0.0)
    return u1, u2


def _chi2_uniform_2d(u1, u2, bins=8):
    h, _, _ = np.histogram2d(u1, u2, bins=bins, range=[[0, 1], [0, 1]])
    n = u1.size
    exp = n / (bins * bins)
    chi2 = float(((h - exp) ** 2 / exp).sum())
    # dof = 63; 99.9% critical value ~ 103.4. Allow generous slack.
    return chi2


def test_sample_li_area_uniform():
    lights, tri_data = _two_triangle_light()
    R = 1 << 17
    ids = jnp.arange(R, dtype=jnp.int32)
    u1 = hash_uniform(7, ids, 0, 1, 0)
    u2 = hash_uniform(7, ids, 0, 1, 1)
    lid = jnp.zeros(R, jnp.int32)
    p = jnp.tile(jnp.asarray([[0.0, 0.0, 5.0]]), (R, 1))
    out = lt.sample_li(lights, tri_data, lid, p, jnp.zeros(R), u1, u2)
    # classify by x: triangle 0 spans x in [0,1], triangle 1 x in [10,13]
    ps = p + out["wi"] * out["dist"][:, None]
    ps = np.asarray(ps)
    in1 = ps[:, 0] > 5.0
    # triangle pick must follow the area cdf (0.1 / 0.9)
    frac1 = in1.mean()
    assert abs(frac1 - 0.9) < 0.01, frac1

    for mask, v0, e1x, e2y in [
        (~in1, np.float32([0, 0, 0]), 1.0, 1.0),
        (in1, np.float32([10, 0, 0]), 3.0, 3.0),
    ]:
        sel = ps[mask]
        u1r, u2r = _recover_uv(sel, np.tile(v0, (sel.shape[0], 1)), e1x, e2y)
        assert u1r.min() > -1e-4 and u1r.max() < 1.0 + 1e-4
        chi2 = _chi2_uniform_2d(np.clip(u1r, 0, 1), np.clip(u2r, 0, 1))
        # dof=63: uniform ~ 63 +- 11; the biased sampler yields >> 1e4
        assert chi2 < 150.0, chi2


def test_sample_emission_area_uniform():
    lights, tri_data = _two_triangle_light()
    R = 1 << 17
    ids = jnp.arange(R, dtype=jnp.int32)
    u_p1 = hash_uniform(11, ids, 0, 2, 0)
    u_p2 = hash_uniform(11, ids, 0, 2, 1)
    u_d1 = hash_uniform(11, ids, 0, 2, 2)
    u_d2 = hash_uniform(11, ids, 0, 2, 3)
    lid = jnp.zeros(R, jnp.int32)
    out = lt.sample_emission(lights, tri_data, lid, u_p1, u_p2, u_d1, u_d2)
    ps = np.asarray(out["p"])
    in1 = ps[:, 0] > 5.0
    assert abs(in1.mean() - 0.9) < 0.01

    sel = ps[in1]
    u1r, u2r = _recover_uv(
        sel, np.tile(np.float32([10, 0, 0]), (sel.shape[0], 1)), 3.0, 3.0
    )
    chi2 = _chi2_uniform_2d(np.clip(u1r, 0, 1), np.clip(u2r, 0, 1))
    assert chi2 < 150.0, chi2
