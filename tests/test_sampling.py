import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goblin_tpu.core import sampling as sp
from goblin_tpu.core import vecmath as vm
from goblin_tpu.core.rng import RenderSampler, hash_uniform

N = 200_000


def _u(seed, n=N):
    k = jax.random.PRNGKey(seed)
    return jax.random.uniform(k, (2, n))


def test_uniform_sphere_mean_and_pdf():
    u1, u2 = _u(0)
    d = sp.uniform_sample_sphere(u1, u2)
    np.testing.assert_allclose(np.asarray(vm.length(d)), np.ones(N), atol=1e-5)
    # mean should vanish; integral of pdf over sphere = 1
    assert np.abs(np.asarray(d).mean(0)).max() < 0.01
    np.testing.assert_allclose(sp.uniform_sphere_pdf() * 4 * np.pi, 1.0, rtol=1e-6)


def test_cosine_hemisphere_matches_pdf():
    # E[f(w)] under cosine sampling == integral f * cos/pi; check with f = cos^2
    u1, u2 = _u(1)
    d = sp.cosine_sample_hemisphere(u1, u2)
    est = float(jnp.mean(d[..., 2] ** 2))
    # integral cos^3/pi over hemisphere = 2pi * int cos^3 sin / pi = 1/2
    np.testing.assert_allclose(est, 0.5, atol=5e-3)


def test_cone_sampling_within_cone():
    u1, u2 = _u(2)
    cos_max = np.cos(np.radians(30.0))
    d = sp.uniform_sample_cone(u1, u2, cos_max)
    assert float(jnp.min(d[..., 2])) >= cos_max - 1e-5
    # solid angle of cone * pdf == 1
    np.testing.assert_allclose(
        sp.uniform_cone_pdf(cos_max) * 2 * np.pi * (1 - cos_max), 1.0, rtol=1e-6
    )


def test_concentric_disk_uniform():
    u1, u2 = _u(3)
    p = sp.uniform_sample_disk(u1, u2)
    r2 = np.asarray(p[..., 0] ** 2 + p[..., 1] ** 2)
    assert r2.max() <= 1.0 + 1e-5
    # uniform on disk: E[r^2] = 1/2, mean = 0
    np.testing.assert_allclose(r2.mean(), 0.5, atol=5e-3)
    assert np.abs(np.asarray(p).mean(0)).max() < 5e-3
    # corners of the square map to the diagonal directions
    c = sp.uniform_sample_disk(jnp.float32(1.0), jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(c), [np.cos(np.pi / 4), np.sin(np.pi / 4)], atol=1e-5)


def test_triangle_sampling_uniform():
    u1, u2 = _u(4)
    u, v = sp.uniform_sample_triangle(u1, u2)
    u, v = np.asarray(u), np.asarray(v)
    assert (u >= 0).all() and (v >= 0).all() and (u + v <= 1 + 1e-6).all()
    # uniform over the unit right triangle: E[u] = E[v] = 1/3
    np.testing.assert_allclose(u.mean(), 1 / 3, atol=5e-3)
    np.testing.assert_allclose(v.mean(), 1 / 3, atol=5e-3)


def test_exponential_sample_mean():
    u1, _ = _u(5)
    x = sp.exponential_sample(u1, 2.0)
    np.testing.assert_allclose(float(jnp.mean(x)), 0.5, atol=1e-2)
    # range-truncated version stays in [a, b]
    t = sp.exponential_sample_range(u1, 1.5, 1.0, 3.0)
    assert float(jnp.min(t)) >= 1.0 - 1e-5 and float(jnp.max(t)) <= 3.0 + 1e-4


def test_equi_angular_pdf_normalized():
    # integral of pdf from a to b should be 1
    D, a, b = 2.0, -1.0, 3.0
    ta, tb = np.arctan(a / D), np.arctan(b / D)
    t = np.linspace(a, b, 20001)
    pdf = np.asarray(sp.equi_angular_pdf(jnp.asarray(t), D, ta, tb))
    np.testing.assert_allclose(np.trapezoid(pdf, t), 1.0, rtol=1e-4)
    # and sampling inverts the cdf
    u1, _ = _u(6)
    ts = sp.equi_angular_sample(u1, D, ta, tb)
    assert float(jnp.min(ts)) >= a - 1e-3 and float(jnp.max(ts)) <= b + 1e-3


def test_power_heuristic():
    w = sp.power_heuristic(1.0, jnp.float32(2.0), 1.0, jnp.float32(1.0))
    np.testing.assert_allclose(float(w), 4.0 / 5.0, rtol=1e-6)


def test_cdf1d_discrete():
    f = jnp.array([1.0, 2.0, 3.0, 4.0])
    t = sp.build_cdf_1d(f)
    u1, _ = _u(7, 100_000)
    idx, pdf = sp.sample_cdf_discrete(t, u1)
    counts = np.bincount(np.asarray(idx), minlength=4) / 100_000
    np.testing.assert_allclose(counts, [0.1, 0.2, 0.3, 0.4], atol=5e-3)
    np.testing.assert_allclose(np.asarray(pdf), counts[np.asarray(idx)], atol=5e-3)


def test_cdf1d_continuous_inversion():
    f = jnp.array([0.0, 1.0, 4.0, 1.0])
    t = sp.build_cdf_1d(f)
    u1, _ = _u(8, 100_000)
    x, pdf, _ = sp.sample_cdf_continuous(t, u1)
    xs = np.asarray(x)
    assert xs.min() >= 0.25 - 1e-4  # zero-density first cell never sampled
    hist, _ = np.histogram(xs, bins=4, range=(0, 1), density=True)
    np.testing.assert_allclose(hist, [0, 4 / 6, 16 / 6, 4 / 6], atol=0.05)


def test_cdf2d_product_distribution():
    f = jnp.asarray(np.outer([1.0, 3.0], [2.0, 1.0, 1.0]), dtype=jnp.float32)
    t = sp.build_cdf_2d(f)
    u1, u2 = _u(9, 100_000)
    uv, pdf = sp.sample_cdf_2d(t, u1, u2)
    uv = np.asarray(uv)
    # row 1 (v > 0.5) should get 3/4 of samples
    np.testing.assert_allclose((uv[:, 1] > 0.5).mean(), 0.75, atol=5e-3)
    # check pdf evaluation matches sampling pdf
    pdf_eval = sp.pdf_cdf_2d(t, jnp.asarray(uv[:, 0]), jnp.asarray(uv[:, 1]))
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf_eval), rtol=1e-4)


def test_radical_inverse():
    # base 2: 1 -> 0.5, 2 -> 0.25, 3 -> 0.75
    ri = sp.radical_inverse(jnp.array([1, 2, 3, 4]), 2)
    np.testing.assert_allclose(np.asarray(ri), [0.5, 0.25, 0.75, 0.125], atol=1e-6)
    ri3 = sp.radical_inverse(jnp.array([1, 2, 3]), 3)
    np.testing.assert_allclose(np.asarray(ri3), [1 / 3, 2 / 3, 1 / 9], atol=1e-6)


def test_permuted_radical_inverse_identity_perm():
    perm = jnp.arange(2, dtype=jnp.int32)
    ri = sp.permuted_radical_inverse(jnp.array([1, 2, 3]), 2, perm)
    np.testing.assert_allclose(np.asarray(ri), [0.5, 0.25, 0.75], atol=1e-5)


def test_permuted_radical_inverse_uniform():
    # any fixed permutation still gives a uniform low-discrepancy sequence
    perm = jnp.array([1, 2, 0], dtype=jnp.int32)
    ri = sp.permuted_radical_inverse(jnp.arange(1, 3**5), 3, perm)
    xs = np.sort(np.asarray(ri))
    gaps = np.diff(xs)
    assert xs.min() >= 0 and xs.max() < 1
    assert gaps.max() < 0.03  # well distributed


def test_hash_uniform_stateless_and_uniform():
    px = jnp.arange(100_000)
    u = hash_uniform(42, px, 0, 0, 0)
    u2 = hash_uniform(42, px, 0, 0, 0)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u2))
    arr = np.asarray(u)
    assert arr.min() >= 0.0 and arr.max() < 1.0
    np.testing.assert_allclose(arr.mean(), 0.5, atol=5e-3)
    np.testing.assert_allclose(arr.var(), 1 / 12, atol=5e-3)
    # different dims decorrelated
    v = np.asarray(hash_uniform(42, px, 0, 0, 1))
    assert abs(np.corrcoef(arr, v)[0, 1]) < 0.01


def test_stratified_2d_coverage():
    k = jax.random.PRNGKey(0)
    s = sp.stratified_2d(k, 4, 4)
    s = np.asarray(s)
    # exactly one sample in each of the 16 cells
    cells = (s[:, 0] * 4).astype(int) * 4 + (s[:, 1] * 4).astype(int)
    assert sorted(cells.tolist()) == list(range(16))


def test_gaussian_sample_truncated():
    u1, u2 = _u(10)
    p = sp.gaussian_sample_2d(u1, u2, 2.0, r_max=1.5)
    r = np.asarray(vm.length(jnp.concatenate([p, jnp.zeros_like(p[..., :1])], axis=-1)))
    assert r.max() <= 1.5 + 1e-4
