import jax.numpy as jnp
import numpy as np
import pytest

from goblin_tpu.core import vecmath as vm


def test_normalize_and_dot():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
    n = vm.normalize(v)
    np.testing.assert_allclose(vm.length(n), [1.0, 1.0], rtol=1e-6)
    np.testing.assert_allclose(vm.dot(v, v), [25.0, 4.0], rtol=1e-6)


def test_coordinate_system_orthonormal():
    rng = np.random.default_rng(0)
    a1 = vm.normalize(jnp.asarray(rng.normal(size=(64, 3)), dtype=jnp.float32))
    a2, a3 = vm.coordinate_system(a1)
    np.testing.assert_allclose(vm.dot(a1, a2), np.zeros(64), atol=1e-5)
    np.testing.assert_allclose(vm.dot(a1, a3), np.zeros(64), atol=1e-5)
    np.testing.assert_allclose(vm.dot(a2, a3), np.zeros(64), atol=1e-5)
    np.testing.assert_allclose(vm.length(a2), np.ones(64), atol=1e-5)
    # right-handed: a3 == a1 x a2
    np.testing.assert_allclose(np.asarray(vm.cross(a1, a2)), np.asarray(a3), atol=1e-5)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    axis = vm.normalize(jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32))
    angle = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(8,)), dtype=jnp.float32)
    q = vm.quat_from_axis_angle(axis, angle)
    v = jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)
    rq = vm.quat_rotate(q, v)
    m = vm.quat_to_matrix(q)
    rm = jnp.einsum("nij,nj->ni", m, v)
    np.testing.assert_allclose(np.asarray(rq), np.asarray(rm), atol=1e-5)


def test_quat_mul_composition():
    qx = vm.quat_from_axis_angle(jnp.array([1.0, 0, 0]), jnp.float32(0.3))
    qy = vm.quat_from_axis_angle(jnp.array([0.0, 1, 0]), jnp.float32(0.7))
    v = jnp.array([0.2, -1.0, 0.5])
    # q = qy * qx applies qx first
    q = vm.quat_mul(qy, qx)
    np.testing.assert_allclose(
        np.asarray(vm.quat_rotate(q, v)),
        np.asarray(vm.quat_rotate(qy, vm.quat_rotate(qx, v))),
        atol=1e-6,
    )


def test_euler_to_quat_xyz():
    # 90 deg about z maps +x to +y
    q = vm.euler_to_quat(jnp.array([0.0, 0.0, 90.0]), "xyz")
    v = vm.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 1.0, 0.0], atol=1e-6)


def test_compose_matrix_trs_order():
    # scale applied before rotation before translation
    q = vm.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.float32(np.pi / 2))
    m = vm.compose_matrix(jnp.array([1.0, 2.0, 3.0]), q, jnp.array([2.0, 1.0, 1.0]))
    p = vm.transform_point(m, jnp.array([1.0, 0.0, 0.0]))
    # scale: (2,0,0); rotate z 90: (0,2,0); translate: (1,4,3)
    np.testing.assert_allclose(np.asarray(p), [1.0, 4.0, 3.0], atol=1e-5)


def test_transform_normal_inverse_transpose():
    q = vm.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.float32(0.4))
    m = vm.compose_matrix(jnp.zeros(3), q, jnp.array([2.0, 1.0, 1.0]))
    m_inv = vm.matrix_inverse(m)
    # tangent on the surface z=0 scaled: normal must stay perpendicular
    t = vm.transform_vector(m, jnp.array([1.0, 1.0, 0.0]))
    n = vm.transform_normal(m_inv, jnp.array([-1.0, 1.0, 0.0]) / np.sqrt(2))
    assert abs(float(vm.dot(t, n))) < 1e-5


def test_perspective_matrix_values():
    m = np.asarray(vm.perspective_lh_d3d(np.radians(60.0), 4 / 3, 0.1, 1000.0))
    assert m[3, 2] == 1.0
    np.testing.assert_allclose(m[1, 1], 1.0 / np.tan(np.radians(30.0)), rtol=1e-6)
    np.testing.assert_allclose(m[0, 0], m[1, 1] * 3 / 4, rtol=1e-6)
    np.testing.assert_allclose(m[2, 2], 1000.0 / 999.9, rtol=1e-5)


def test_quadratic_stable():
    has, t1, t2 = vm.quadratic(jnp.float32(1.0), jnp.float32(-5.0), jnp.float32(6.0))
    assert bool(has)
    np.testing.assert_allclose([float(t1), float(t2)], [2.0, 3.0], rtol=1e-6)
    has, _, _ = vm.quadratic(jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0))
    assert not bool(has)


def test_solve_2x2():
    ok, x0, x1 = vm.solve_2x2(*map(jnp.float32, (2.0, 1.0, 1.0, 3.0, 5.0, 10.0)))
    assert bool(ok)
    np.testing.assert_allclose([float(x0), float(x1)], [1.0, 3.0], rtol=1e-6)
