"""Procedural shape generators + OBJ mesh loading (host-side, numpy).

Replaces the reference shape plugins (`/root/reference/src/render_core/shape/
{quad,cube,sphere,model}.cpp`). Geometry conventions match the reference:
quad spans XZ with +Y normal, cube is 24-vert/12-tri with per-face normals,
sphere is a lat-long tessellation. Everything is triangulated at load; kernels
only ever see flat triangle arrays.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class TriMesh:
    """Host mesh: positions [V,3], normals [V,3], uvs [V,2], tris [T,3] int32."""
    positions: np.ndarray
    normals: np.ndarray
    uvs: np.ndarray
    triangles: np.ndarray

    @property
    def num_triangles(self):
        return len(self.triangles)

    def transformed(self, m):
        from ..core import transform as xf
        return TriMesh(
            positions=xf.apply_points(m, self.positions).astype(np.float32),
            normals=xf.apply_normals(m, self.normals).astype(np.float32),
            uvs=self.uvs,
            triangles=self.triangles,
        )


def make_quad(width=1.0, height=1.0):
    """Quad in the XZ plane, +Y normal (quad.cpp)."""
    w, h = width / 2.0, height / 2.0
    P = np.array([[w, 0, h], [w, 0, -h], [-w, 0, h], [-w, 0, -h]], np.float32)
    N = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    UV = np.array([[1, 1], [1, 0], [0, 1], [0, 0]], np.float32)
    T = np.array([[0, 1, 2], [2, 1, 3]], np.int32)
    return TriMesh(P, N, UV, T)


def make_cube(x=1.0, y=None, z=None):
    """Axis-aligned box, 24 verts with per-face normals (cube.cpp)."""
    y = x if not y else y
    z = y if not z else z
    hx, hy, hz = x / 2.0, y / 2.0, z / 2.0
    P = np.array([
        [-hx, -hy, hz], [hx, -hy, hz], [-hx, hy, hz], [hx, hy, hz],      # +z
        [-hx, hy, -hz], [hx, hy, -hz], [-hx, -hy, -hz], [hx, -hy, -hz],  # -z
        [-hx, hy, hz], [hx, hy, hz], [-hx, hy, -hz], [hx, hy, -hz],      # +y
        [-hx, -hy, hz], [hx, -hy, hz], [-hx, -hy, -hz], [hx, -hy, -hz],  # -y
        [hx, -hy, hz], [hx, hy, hz], [hx, hy, -hz], [hx, -hy, -hz],      # +x
        [-hx, -hy, hz], [-hx, hy, hz], [-hx, hy, -hz], [-hx, -hy, -hz],  # -x
    ], np.float32)
    face_normals = np.array(
        [[0, 0, 1], [0, 0, -1], [0, 1, 0], [0, -1, 0], [1, 0, 0], [-1, 0, 0]],
        np.float32)
    N = np.repeat(face_normals, 4, axis=0)
    UV = np.array([
        [0, 0], [1, 0], [0, 1], [1, 1],
        [0, 1], [1, 1], [0, 0], [1, 0],
        [0, 1], [1, 1], [0, 0], [1, 0],
        [0, 1], [1, 1], [0, 0], [1, 0],
        [0, 1], [1, 1], [1, 0], [0, 0],
        [0, 1], [1, 1], [1, 0], [0, 0],
    ], np.float32)
    T = np.array([
        [0, 1, 3], [0, 3, 2],
        [6, 5, 7], [4, 5, 6],
        [10, 9, 11], [8, 9, 10],
        [13, 14, 15], [13, 12, 14],
        [18, 17, 19], [17, 16, 19],
        [21, 22, 23], [20, 21, 23],
    ], np.int32)
    return TriMesh(P, N, UV, T)


def make_sphere(radius=1.0, sub_div=60):
    """Lat-long sphere matching sphere.cpp topology."""
    theta_div = int(sub_div)
    phi_div = 2 * theta_div
    verts = [np.array([0.0, radius, 0.0])]
    norms = [np.array([0.0, 1.0, 0.0])]
    uvs = [np.array([0.0, 0.0])]
    for i in range(1, theta_div):
        v = i / theta_div
        theta = np.pi * v
        yv = radius * np.cos(theta)
        r = radius * np.sin(theta)
        for j in range(phi_div):
            u = j / phi_div
            phi = u * 2.0 * np.pi
            p = np.array([np.cos(phi) * r, yv, np.sin(phi) * r])
            verts.append(p)
            norms.append(p / max(np.linalg.norm(p), 1e-20))
            uvs.append(np.array([u, v]))
    verts.append(np.array([0.0, -radius, 0.0]))
    norms.append(np.array([0.0, -1.0, 0.0]))
    uvs.append(np.array([0.0, 1.0]))

    tris = []
    for i in range(phi_div):
        tris.append([0, (i + 1) % phi_div + 1, i + 1])
    for i in range(theta_div - 2):
        vs = 1 + i * phi_div
        for j in range(phi_div):
            if j != phi_div - 1:
                tris.append([vs, vs + 1, vs + phi_div])
                tris.append([vs + 1, vs + phi_div + 1, vs + phi_div])
            else:
                tris.append([vs, vs + 1 - phi_div, vs + phi_div])
                tris.append([vs + 1 - phi_div, vs + 1, vs + phi_div])
            vs += 1
    ve = len(verts) - 1
    for i in range(phi_div):
        idx1 = i + 1
        idx2 = (1 + i) % phi_div + 1
        tris.append([ve, ve - idx2, ve - idx1])

    return TriMesh(np.asarray(verts, np.float32), np.asarray(norms, np.float32),
                   np.asarray(uvs, np.float32), np.asarray(tris, np.int32))


def load_obj(path, smooth=True):
    """Minimal Wavefront OBJ loader (v / vn / vt / f, polygon fan-triangulated).

    Replaces the assimp importer for OBJ assets
    (`/root/reference/src/importers/assimp/assimp_parser.h`). Returns one
    merged TriMesh; missing normals are area-weighted vertex normals.
    """
    vs, vts, vns = [], [], []
    out_pos, out_uv, out_nrm, tris = [], [], [], []
    cache = {}

    def emit(tok):
        if tok in cache:
            return cache[tok]
        parts = tok.split("/")
        vi = int(parts[0])
        vi = vi - 1 if vi > 0 else len(vs) + vi
        ti = ni = -1
        if len(parts) > 1 and parts[1]:
            ti = int(parts[1])
            ti = ti - 1 if ti > 0 else len(vts) + ti
        if len(parts) > 2 and parts[2]:
            ni = int(parts[2])
            ni = ni - 1 if ni > 0 else len(vns) + ni
        idx = len(out_pos)
        out_pos.append(vs[vi])
        out_uv.append(vts[ti] if ti >= 0 else (0.0, 0.0))
        out_nrm.append(vns[ni] if ni >= 0 else (0.0, 0.0, 0.0))
        cache[tok] = idx
        return idx

    with open(path, "r", errors="ignore") as f:
        for line in f:
            if line.startswith("v "):
                p = line.split()
                vs.append((float(p[1]), float(p[2]), float(p[3])))
            elif line.startswith("vt "):
                p = line.split()
                vts.append((float(p[1]), float(p[2])))
            elif line.startswith("vn "):
                p = line.split()
                vns.append((float(p[1]), float(p[2]), float(p[3])))
            elif line.startswith("f "):
                toks = line.split()[1:]
                idxs = [emit(t) for t in toks]
                for k in range(1, len(idxs) - 1):
                    tris.append([idxs[0], idxs[k], idxs[k + 1]])

    P = np.asarray(out_pos, np.float32)
    N = np.asarray(out_nrm, np.float32)
    UV = np.asarray(out_uv, np.float32)
    T = np.asarray(tris, np.int32)

    if smooth and (len(N) == 0 or not np.any(np.abs(N).sum(-1) > 0)):
        N = np.zeros_like(P)
        p0, p1, p2 = P[T[:, 0]], P[T[:, 1]], P[T[:, 2]]
        fn = np.cross(p1 - p0, p2 - p0)  # area-weighted
        for k in range(3):
            np.add.at(N, T[:, k], fn)
        N /= np.maximum(np.linalg.norm(N, axis=-1, keepdims=True), 1e-20)
    return TriMesh(P, N, UV, T)


def load_model(path, **kw):
    """Dispatch by extension: OBJ (native C++ parser when built, Python
    fallback), glTF/GLB, PLY."""
    gltf_node = kw.pop("gltf_node", None)
    gltf_prim = kw.pop("gltf_prim", None)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        try:
            from .. import native
            out = native.load_obj_native(path)
        except Exception:
            out = None
        if out is not None:
            P, N, UV, T = out
            if len(T) and not np.any(np.abs(N).sum(-1) > 0):
                p0, p1, p2 = P[T[:, 0]], P[T[:, 1]], P[T[:, 2]]
                fn = np.cross(p1 - p0, p2 - p0)
                N = np.zeros_like(P)
                for k in range(3):
                    np.add.at(N, T[:, k], fn)
                N /= np.maximum(np.linalg.norm(N, axis=-1, keepdims=True), 1e-20)
            return TriMesh(P, N, UV, T)
        return load_obj(path, **kw)
    if ext in (".gltf", ".glb"):
        from .gltf import load_gltf
        return load_gltf(path, node=gltf_node, prim=gltf_prim)
    if ext == ".ply":
        return load_ply(path)
    if ext == ".stl":
        return load_stl(path)
    raise ValueError(f"unsupported mesh format: {ext}")


def load_stl(path):
    """STL mesh (binary + ascii). STL is a triangle soup with no shared
    vertices or uvs; vertices are welded by position so vertex normals can
    smooth, and uvs default to zero (importer breadth beyond OBJ/glTF/PLY
    — the reference gets this from assimp, assimp_parser.h:36-60)."""
    with open(path, "rb") as f:
        head = f.read(80)
        rest = f.read()
    is_ascii = head[:5].lower() == b"solid" and b"facet" in rest[:2048]
    tris = []
    if is_ascii:
        txt = (head + rest).decode("utf-8", errors="ignore")
        cur = []
        for line in txt.splitlines():
            t = line.strip().split()
            if len(t) >= 4 and t[0] == "vertex":
                cur.append([float(t[1]), float(t[2]), float(t[3])])
                if len(cur) == 3:
                    tris.append(cur)
                    cur = []
        verts = np.asarray(tris, np.float32).reshape(-1, 3)
    else:
        n = int.from_bytes(rest[:4], "little")
        data = np.frombuffer(rest[4:4 + n * 50], np.uint8)
        if len(data) < n * 50:
            raise ValueError("truncated binary STL")
        rec = data.reshape(n, 50)
        verts = rec[:, 12:48].copy().view(np.float32).reshape(-1, 3)
    if len(verts) == 0:
        raise ValueError("empty STL")
    # weld duplicate positions -> indexed mesh with smooth normals
    key = np.round(verts.astype(np.float64) * 1e5).astype(np.int64)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    P = np.zeros((len(uniq), 3), np.float32)
    np.maximum.at(P, inv, verts)  # representative position per weld cell
    T = inv.reshape(-1, 3).astype(np.int64)
    # drop degenerate faces produced by welding
    good = ((T[:, 0] != T[:, 1]) & (T[:, 1] != T[:, 2])
            & (T[:, 0] != T[:, 2]))
    T = T[good]
    fn = np.cross(P[T[:, 1]] - P[T[:, 0]], P[T[:, 2]] - P[T[:, 0]])
    N = np.zeros_like(P)
    for k in range(3):
        np.add.at(N, T[:, k], fn)
    N /= np.maximum(np.linalg.norm(N, axis=-1, keepdims=True), 1e-20)
    UV = np.zeros((len(P), 2), np.float32)
    return TriMesh(P, N.astype(np.float32), UV, T)


def load_ply(path):
    """PLY mesh loader (ascii + binary_little_endian), covering the format
    breadth the reference gets from assimp (assimp_parser.h:36-60).
    Reads vertex x/y/z (+nx/ny/nz, s/t|u/v when present) and face lists."""
    _PLY_DT = {"char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
               "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
               "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
               "float": "f4", "float32": "f4", "double": "f8",
               "float64": "f8"}
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"not a PLY file: {path}")
        fmt = None
        elements = []   # (name, count, [(prop_name, dtype)| list prop])
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unterminated PLY header")
            parts = line.decode("ascii", "replace").strip().split()
            if not parts or parts[0] == "comment":
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elements.append((parts[1], int(parts[2]), []))
            elif parts[0] == "property":
                if parts[1] == "list":
                    elements[-1][2].append(
                        ("list", _PLY_DT[parts[2]], _PLY_DT[parts[3]],
                         parts[4]))
                else:
                    elements[-1][2].append(("scalar", _PLY_DT[parts[1]],
                                            parts[2]))
            elif parts[0] == "end_header":
                break
        data = {}
        if fmt == "ascii":
            for name, count, props in elements:
                rows = []
                for _ in range(count):
                    rows.append(f.readline().split())
                if any(p[0] == "list" for p in props):
                    faces = []
                    for r in rows:
                        n = int(r[0])
                        faces.append([int(v) for v in r[1:1 + n]])
                    data[name] = ("faces", faces)
                else:
                    arr = np.array([[float(v) for v in r] for r in rows],
                                   np.float32)
                    data[name] = ("table", [p[2] for p in props], arr)
        elif fmt == "binary_little_endian":
            for name, count, props in elements:
                if any(p[0] == "list" for p in props):
                    faces = []
                    lp = next(p for p in props if p[0] == "list")
                    cdt = np.dtype("<" + lp[1])
                    vdt = np.dtype("<" + lp[2])
                    for _ in range(count):
                        n = int(np.frombuffer(f.read(cdt.itemsize),
                                              cdt)[0])
                        faces.append(np.frombuffer(
                            f.read(vdt.itemsize * n), vdt).tolist())
                    data[name] = ("faces", faces)
                else:
                    dt = np.dtype([(p[2], "<" + p[1]) for p in props])
                    raw = np.frombuffer(f.read(dt.itemsize * count), dt)
                    arr = np.stack([raw[p[2]].astype(np.float32)
                                    for p in props], -1)
                    data[name] = ("table", [p[2] for p in props], arr)
        else:
            raise ValueError(f"unsupported PLY format: {fmt}")

    kind, names, varr = data["vertex"][0], data["vertex"][1], data["vertex"][2]
    col = {n: i for i, n in enumerate(names)}
    P = np.stack([varr[:, col[c]] for c in ("x", "y", "z")], -1)
    if all(c in col for c in ("nx", "ny", "nz")):
        N = np.stack([varr[:, col[c]] for c in ("nx", "ny", "nz")], -1)
    else:
        N = np.zeros_like(P)
    uv_names = ("s", "t") if "s" in col else ("u", "v")
    if all(c in col for c in uv_names):
        UV = np.stack([varr[:, col[c]] for c in uv_names], -1)
    else:
        UV = np.zeros((len(P), 2), np.float32)
    faces = data.get("face", ("faces", []))[1]
    tris = []
    for fc in faces:
        for k in range(1, len(fc) - 1):   # fan-triangulate
            tris.append((fc[0], fc[k], fc[k + 1]))
    T = np.asarray(tris, np.int32).reshape(-1, 3)
    if not np.any(np.abs(N).sum(-1) > 0) and len(T):
        p0, p1, p2 = P[T[:, 0]], P[T[:, 1]], P[T[:, 2]]
        fn = np.cross(p1 - p0, p2 - p0)
        N = np.zeros_like(P)
        for k in range(3):
            np.add.at(N, T[:, k], fn)
        N /= np.maximum(np.linalg.norm(N, axis=-1, keepdims=True), 1e-20)
    return TriMesh(P.astype(np.float32), N.astype(np.float32),
                   UV.astype(np.float32), T)


def geometry_key(stype, params, scene_dir="."):
    """Hashable identity of a shape's GEOMETRY (transform/material excluded)
    for the mesh registry (`/root/reference/src/base/mgr/mesh_registry.h:
    12-38` hash-dedup). None = not cacheable."""
    if stype == "quad" or stype in ("quad_y", "quady"):
        return ("quad", params.get("width", 1.0), params.get("height", 1.0))
    if stype == "cube":
        return ("cube", params.get("x", 1.0), params.get("y", 0),
                params.get("z", 0))
    if stype == "sphere":
        return ("sphere", params.get("radius", 1.0),
                params.get("sub_div", 60))
    if stype == "model":
        fn = params.get("fn")
        if fn is None:
            return None
        return ("model", os.path.abspath(os.path.join(scene_dir, fn)),
                params.get("smooth", True), params.get("gltf_node"),
                params.get("gltf_prim"))
    return None


def make_shape(stype, params, scene_dir="."):
    """Shape factory keyed by the JSON `type` (reference plugin names)."""
    if stype == "quad":
        return make_quad(params.get("width", 1.0), params.get("height", 1.0))
    if stype in ("quad_y", "quady"):
        m = make_quad(params.get("width", 1.0), params.get("height", 1.0))
        return m
    if stype == "cube":
        return make_cube(params.get("x", 1.0), params.get("y", 0) or None,
                         params.get("z", 0) or None)
    if stype == "sphere":
        return make_sphere(params.get("radius", 1.0), params.get("sub_div", 60))
    if stype == "model":
        fn = params.get("fn")
        return load_model(os.path.join(scene_dir, fn),
                          smooth=params.get("smooth", True),
                          gltf_node=params.get("gltf_node"),
                          gltf_prim=params.get("gltf_prim"))
    raise ValueError(f"unknown shape type: {stype}")
