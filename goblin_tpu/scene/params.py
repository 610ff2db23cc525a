"""ParamSet: typed key-value view over parsed JSON scene sections.

Mirrors the reference semantics (src/GoblinParamSet.{h,cpp},
GoblinContextLoader.cpp:33-65): JSON arrays of length 2/3/4 become
vectors, lookups fall back to typed defaults, first match wins.
"""

from __future__ import annotations

import numpy as np


class ParamSet:
    def __init__(self, raw: dict | None = None):
        self.raw = dict(raw or {})

    def has(self, key) -> bool:
        return key in self.raw

    def get_bool(self, key, default=False) -> bool:
        v = self.raw.get(key, default)
        return bool(v)

    def get_int(self, key, default=0) -> int:
        v = self.raw.get(key, default)
        return int(v)

    def get_float(self, key, default=0.0) -> float:
        v = self.raw.get(key, default)
        if isinstance(v, (list, tuple)):
            v = v[0]
        return float(v)

    def get_string(self, key, default="") -> str:
        v = self.raw.get(key, default)
        return str(v)

    def _get_vec(self, key, default, n):
        v = self.raw.get(key, None)
        if v is None:
            v = default
        arr = np.asarray(v, dtype=np.float32).reshape(-1)
        if arr.size == 1:
            arr = np.full(n, float(arr[0]), np.float32)
        if arr.size != n:
            raise ValueError(f"param {key}: expected {n} components, got {arr.size}")
        return arr

    def get_vec2(self, key, default=(0.0, 0.0)):
        return self._get_vec(key, default, 2)

    def get_vec3(self, key, default=(0.0, 0.0, 0.0)):
        return self._get_vec(key, default, 3)

    def get_vec4(self, key, default=(0.0, 0.0, 0.0, 0.0)):
        return self._get_vec(key, default, 4)


def get_quaternion(params: ParamSet) -> np.ndarray:
    """orientation (wxyz) or euler+rotation_order -> quaternion (numpy).
    Reference getQuaternion (src/GoblinUtils.cpp:71-82)."""
    from ..core import vecmath as vm
    import jax.numpy as jnp

    if params.has("euler"):
        xyz = params.get_vec3("euler")
        order = params.get_string("rotation_order", "xyz")
        q = np.asarray(vm.euler_to_quat(jnp.asarray(xyz), order), dtype=np.float32)
        return q
    return params.get_vec4("orientation", (1.0, 0.0, 0.0, 0.0))


def quat_matrix_np(q: np.ndarray) -> np.ndarray:
    """(4,) wxyz -> (3,3) rotation, pure numpy."""
    w, x, y, z = [float(v) for v in q]
    x2, y2, z2 = 2 * x, 2 * y, 2 * z
    return np.array(
        [
            [1 - y2 * y - z2 * z, x2 * y - z2 * w, x2 * z + y2 * w],
            [x2 * y + z2 * w, 1 - x2 * x - z2 * z, y2 * z - x2 * w],
            [x2 * z - y2 * w, y2 * z + x2 * w, 1 - x2 * x - y2 * y],
        ],
        dtype=np.float32,
    )


def get_transform(params: ParamSet) -> np.ndarray:
    """position/orientation/scale -> 4x4 world matrix (numpy, M = T R S).
    Reference getTransform (src/GoblinUtils.cpp:84-91)."""
    pos = params.get_vec3("position", (0.0, 0.0, 0.0))
    q = get_quaternion(params)
    scale = params.get_vec3("scale", (1.0, 1.0, 1.0))
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = quat_matrix_np(q) * scale[None, :]
    m[:3, 3] = pos
    return m
