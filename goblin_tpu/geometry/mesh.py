"""Host-side OBJ mesh loading into SoA numpy arrays.

Feature parity with the reference OBJ parser
(src/GoblinPolygonMesh.cpp:58-262): v/vn/vt records, triangle and quad
faces (quads split 0-1-2 / 0-2-3), negative (relative) indices, all four
face formats (v, v/t, v//n, v/t/n), and vertex dedup on the (v, t, n)
index triple. Output is flat numpy arrays ready to bake into the
device-resident triangle soup.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class TriangleMesh:
    """Indexed triangle mesh (host, numpy)."""

    positions: np.ndarray  # (V, 3) float32
    normals: np.ndarray | None  # (V, 3) float32 or None
    uvs: np.ndarray | None  # (V, 2) float32 or None
    faces: np.ndarray  # (F, 3) int32

    @property
    def num_faces(self) -> int:
        return int(self.faces.shape[0])

    @property
    def has_normals(self) -> bool:
        return self.normals is not None

    @property
    def has_uvs(self) -> bool:
        return self.uvs is not None

    def face_areas(self) -> np.ndarray:
        p = self.positions[self.faces]
        e1 = p[:, 1] - p[:, 0]
        e2 = p[:, 2] - p[:, 0]
        return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)

    def area(self) -> float:
        return float(self.face_areas().sum())


def _resolve_index(raw: int, count: int) -> int:
    """OBJ indices are 1-based; negative indices count back from the end."""
    return raw - 1 if raw > 0 else count + raw


def load_obj(path: str) -> TriangleMesh:
    """Parse an OBJ file into a deduplicated TriangleMesh.

    Prefers the native C++ parser (native/obj_loader.cpp); falls back to
    the pure-python parser below.
    """
    from ..native import load_obj as native_load

    mesh = native_load(path)
    if mesh is not None:
        return mesh
    return _load_obj_python(path)


def _load_obj_python(path: str) -> TriangleMesh:
    """Pure-python OBJ parser (reference implementation)."""
    positions: list[tuple] = []
    normals: list[tuple] = []
    uvs: list[tuple] = []
    # dedup map: (vi, ti, ni) -> output vertex index
    vert_map: dict[tuple, int] = {}
    out_pos: list[tuple] = []
    out_nrm: list[tuple] = []
    out_uv: list[tuple] = []
    faces: list[tuple] = []
    any_normal = False
    any_uv = False

    def corner(token: str) -> int:
        nonlocal any_normal, any_uv
        parts = token.split("/")
        vi = _resolve_index(int(parts[0]), len(positions))
        ti = ni = -1
        if len(parts) >= 2 and parts[1]:
            ti = _resolve_index(int(parts[1]), len(uvs))
            any_uv = True
        if len(parts) >= 3 and parts[2]:
            ni = _resolve_index(int(parts[2]), len(normals))
            any_normal = True
        key = (vi, ti, ni)
        idx = vert_map.get(key)
        if idx is None:
            idx = len(out_pos)
            vert_map[key] = idx
            out_pos.append(positions[vi])
            out_uv.append(uvs[ti] if ti >= 0 else (0.0, 0.0))
            out_nrm.append(normals[ni] if ni >= 0 else (0.0, 0.0, 0.0))
        return idx

    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            tokens = line.split()
            tag = tokens[0]
            if tag == "v":
                positions.append(tuple(float(x) for x in tokens[1:4]))
            elif tag == "vn":
                normals.append(tuple(float(x) for x in tokens[1:4]))
            elif tag == "vt":
                uvs.append(tuple(float(x) for x in tokens[1:3]))
            elif tag == "f":
                corners = [corner(t) for t in tokens[1:]]
                if len(corners) >= 3:
                    faces.append((corners[0], corners[1], corners[2]))
                if len(corners) == 4:  # quad -> second triangle 0-2-3
                    faces.append((corners[0], corners[2], corners[3]))

    if not faces:
        raise ValueError(f"no faces parsed from OBJ: {path}")

    return TriangleMesh(
        positions=np.asarray(out_pos, dtype=np.float32),
        normals=np.asarray(out_nrm, dtype=np.float32) if any_normal else None,
        uvs=np.asarray(out_uv, dtype=np.float32) if any_uv else None,
        faces=np.asarray(faces, dtype=np.int32),
    )


def make_sphere_mesh(radius: float, n_theta: int = 32, n_phi: int = 64) -> TriangleMesh:
    """Procedural UV sphere (used for tessellation fallbacks and tests)."""
    th = np.linspace(0.0, np.pi, n_theta + 1)
    ph = np.linspace(0.0, 2 * np.pi, n_phi + 1)
    T, P = np.meshgrid(th, ph, indexing="ij")
    x = radius * np.sin(T) * np.cos(P)
    y = radius * np.sin(T) * np.sin(P)
    z = radius * np.cos(T)
    pos = np.stack([x, y, z], axis=-1).reshape(-1, 3).astype(np.float32)
    nrm = pos / max(radius, 1e-9)
    uv = np.stack([P / (2 * np.pi), T / np.pi], axis=-1).reshape(-1, 2).astype(np.float32)

    def vid(i, j):
        return i * (n_phi + 1) + j

    faces = []
    for i in range(n_theta):
        for j in range(n_phi):
            a, b, c, d = vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)
            # (a,b,c) degenerates at the south pole (b,c coincide);
            # (a,c,d) degenerates at the north pole (a,d coincide)
            if i < n_theta - 1:
                faces.append((a, b, c))
            if i > 0:
                faces.append((a, c, d))
    return TriangleMesh(
        positions=pos,
        normals=nrm.astype(np.float32),
        uvs=uv,
        faces=np.asarray(faces, dtype=np.int32),
    )


def write_obj(path: str, mesh: TriangleMesh) -> None:
    """Minimal OBJ writer (used to materialize generated example assets)."""
    with open(path, "w") as f:
        for p in mesh.positions:
            f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        if mesh.normals is not None:
            for n in mesh.normals:
                f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
        if mesh.uvs is not None:
            for t in mesh.uvs:
                f.write(f"vt {t[0]:.6f} {t[1]:.6f}\n")
        has_n, has_t = mesh.normals is not None, mesh.uvs is not None
        for face in mesh.faces:
            ids = [int(i) + 1 for i in face]
            if has_n and has_t:
                f.write("f " + " ".join(f"{i}/{i}/{i}" for i in ids) + "\n")
            elif has_n:
                f.write("f " + " ".join(f"{i}//{i}" for i in ids) + "\n")
            elif has_t:
                f.write("f " + " ".join(f"{i}/{i}" for i in ids) + "\n")
            else:
                f.write("f " + " ".join(str(i) for i in ids) + "\n")
