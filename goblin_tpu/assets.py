"""Procedural stand-in assets.

The reference's examples/bunny.json references models/bunny.obj which is
NOT present in the reference checkout (only plane.obj exists — see
BASELINE.md). This module deterministically generates a bunny-class
organic mesh (displaced sphere with head/ear lobes, ~bunny triangle
count) so the benchmark scene is reproducible without external downloads.
"""

from __future__ import annotations

import os

import numpy as np

from .geometry.mesh import TriangleMesh, make_sphere_mesh, write_obj


def _lobe(p, center, radius, sharp=6.0):
    d2 = np.sum((p - center) ** 2, axis=-1)
    return np.exp(-sharp * d2 / (radius * radius))


def make_bunny_mesh(n_theta: int = 100, n_phi: int = 200) -> TriangleMesh:
    """A smooth blobby 'bunny': body sphere with head + two ear lobes,
    ~(2*n_theta*n_phi) triangles. Deterministic."""
    base = make_sphere_mesh(1.0, n_theta, n_phi)
    p = base.positions.astype(np.float64)
    # displace radius by smooth lobes: head up-front, two ears, tail
    dirs = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    r = np.ones(p.shape[0])
    r += 0.55 * _lobe(dirs, np.array([0.0, 0.55, 0.8]), 0.9, 3.0)  # head
    r += 0.85 * _lobe(dirs, np.array([0.25, 0.95, 0.45]), 0.55, 9.0)  # ear R
    r += 0.85 * _lobe(dirs, np.array([-0.25, 0.95, 0.45]), 0.55, 9.0)  # ear L
    r += 0.25 * _lobe(dirs, np.array([0.0, -0.2, -1.0]), 0.7, 5.0)  # tail
    r += 0.3 * _lobe(dirs, np.array([0.0, -0.9, 0.3]), 0.9, 2.0)  # haunch
    # gentle low-frequency wobble for organic look (deterministic)
    r += 0.05 * np.sin(3.0 * dirs[:, 0] + 1.0) * np.cos(2.0 * dirs[:, 1])
    pos = (dirs * r[:, None] * 0.13).astype(np.float32)  # ~bunny.json scale

    # recompute smooth vertex normals from faces
    f = base.faces
    fv = pos[f]
    fn = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    n = np.zeros_like(pos)
    for k in range(3):
        np.add.at(n, f[:, k], fn)
    ln = np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    n = (n / ln).astype(np.float32)
    return TriangleMesh(positions=pos, normals=n, uvs=base.uvs, faces=f)


def ensure_bunny_obj(path: str) -> str:
    """Write the generated bunny to `path` if absent; returns the path."""
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        write_obj(path, make_bunny_mesh())
    return path
