"""Minimal glTF 2.0 mesh importer (.gltf JSON + .bin buffers, .glb).

Part of the importer capability the reference gets from assimp
(`/root/reference/src/importers/assimp/assimp_parser.h`): extracts triangle
meshes (POSITION/NORMAL/TEXCOORD_0 + indices) with node transforms applied.
Materials/cameras/lights from glTF are not mapped yet (scene JSON drives
those).
"""
from __future__ import annotations

import base64
import json
import os
import struct as _struct

import numpy as np

from .shapes import TriMesh

_COMP_DTYPE = {5120: np.int8, 5121: np.uint8, 5122: np.int16,
               5123: np.uint16, 5125: np.uint32, 5126: np.float32}
_TYPE_SIZE = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _load_gltf_json(path):
    if path.endswith(".glb"):
        with open(path, "rb") as f:
            data = f.read()
        magic, version, length = _struct.unpack_from("<III", data, 0)
        assert magic == 0x46546C67, "not a glb"
        off = 12
        doc = None
        buffers = []
        while off < length:
            clen, ctype = _struct.unpack_from("<II", data, off)
            off += 8
            chunk = data[off:off + clen]
            off += clen
            if ctype == 0x4E4F534A:  # JSON
                doc = json.loads(chunk)
            elif ctype == 0x004E4942:  # BIN
                buffers.append(chunk)
        return doc, buffers
    with open(path, "r") as f:
        return json.load(f), []


def _read_buffer(doc, bin_chunks, idx, base_dir):
    buf = doc["buffers"][idx]
    uri = buf.get("uri")
    if uri is None:
        return bin_chunks[idx]
    if uri.startswith("data:"):
        return base64.b64decode(uri.split(",", 1)[1])
    with open(os.path.join(base_dir, uri), "rb") as f:
        return f.read()


def _accessor(doc, buffers_cache, bin_chunks, base_dir, idx):
    acc = doc["accessors"][idx]
    bv = doc["bufferViews"][acc["bufferView"]]
    bidx = bv["buffer"]
    if bidx not in buffers_cache:
        buffers_cache[bidx] = _read_buffer(doc, bin_chunks, bidx, base_dir)
    raw = buffers_cache[bidx]
    dtype = _COMP_DTYPE[acc["componentType"]]
    ncomp = _TYPE_SIZE[acc["type"]]
    count = acc["count"]
    offset = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = bv.get("byteStride") or dtype().itemsize * ncomp
    if stride == dtype().itemsize * ncomp:
        arr = np.frombuffer(raw, dtype, count * ncomp, offset)
        return arr.reshape(count, ncomp).copy()
    out = np.empty((count, ncomp), dtype)
    isz = dtype().itemsize
    for i in range(count):
        out[i] = np.frombuffer(raw, dtype, ncomp, offset + i * stride)
    return out


def _node_matrix(node):
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
    m = np.eye(4)
    if "scale" in node:
        m[:3, :3] *= np.asarray(node["scale"])
    if "rotation" in node:  # xyzw quaternion
        x, y, z, w = node["rotation"]
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])
        m = np.block([[R @ m[:3, :3], np.zeros((3, 1))], [np.zeros((1, 3)), np.ones((1, 1))]])
    if "translation" in node:
        m[:3, 3] = node["translation"]
    return m


def load_gltf(path):
    """Load all triangle primitives (world-transformed) -> one TriMesh."""
    doc, bin_chunks = _load_gltf_json(path)
    base_dir = os.path.dirname(os.path.abspath(path))
    cache = {}

    P, N, UV, T = [], [], [], []
    voff = 0

    def visit(node_idx, parent):
        nonlocal voff
        node = doc["nodes"][node_idx]
        m = parent @ _node_matrix(node)
        if "mesh" in node:
            mesh = doc["meshes"][node["mesh"]]
            for prim in mesh.get("primitives", []):
                if prim.get("mode", 4) != 4:
                    continue
                attrs = prim["attributes"]
                pos = _accessor(doc, cache, bin_chunks, base_dir,
                                attrs["POSITION"]).astype(np.float64)
                pos = pos @ m[:3, :3].T + m[:3, 3]
                n_el = len(pos)
                if "NORMAL" in attrs:
                    nrm = _accessor(doc, cache, bin_chunks, base_dir,
                                    attrs["NORMAL"]).astype(np.float64)
                    inv_t = np.linalg.inv(m[:3, :3]).T
                    nrm = nrm @ inv_t.T
                    ln = np.linalg.norm(nrm, axis=-1, keepdims=True)
                    nrm = nrm / np.maximum(ln, 1e-12)
                else:
                    nrm = np.zeros_like(pos)
                if "TEXCOORD_0" in attrs:
                    uv = _accessor(doc, cache, bin_chunks, base_dir,
                                   attrs["TEXCOORD_0"]).astype(np.float32)
                    if uv.dtype != np.float32:
                        uv = uv.astype(np.float32)
                else:
                    uv = np.zeros((n_el, 2), np.float32)
                if "indices" in prim:
                    idx = _accessor(doc, cache, bin_chunks, base_dir,
                                    prim["indices"]).reshape(-1).astype(np.int64)
                else:
                    idx = np.arange(n_el, dtype=np.int64)
                tris = idx.reshape(-1, 3) + voff
                P.append(pos.astype(np.float32))
                N.append(nrm.astype(np.float32))
                UV.append(uv[:, :2])
                T.append(tris.astype(np.int32))
                voff += n_el
        for c in node.get("children", []):
            visit(c, m)

    scene_idx = doc.get("scene", 0)
    roots = doc["scenes"][scene_idx]["nodes"] if "scenes" in doc else \
        list(range(len(doc.get("nodes", []))))
    for r in roots:
        visit(r, np.eye(4))

    if not P:
        raise ValueError(f"no triangle meshes in {path}")
    return TriMesh(np.concatenate(P), np.concatenate(N),
                   np.concatenate(UV), np.concatenate(T))
