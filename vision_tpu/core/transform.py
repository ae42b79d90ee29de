"""4x4 affine transforms (host-side, numpy) for scene construction.

Mirrors the reference `TransformDesc` variants (matrix4x4 / look_at / Euler /
yaw — `/root/reference/src/base/import/node_desc.h:104-109`). Scene-load-time
only: geometry is pre-transformed to world space so kernels never apply
per-instance matrices (TPU-friendly: no gather of matrices in the hot loop).
"""
from __future__ import annotations

import numpy as np


def identity():
    return np.eye(4, dtype=np.float64)


def translation(t):
    m = identity()
    m[:3, 3] = t
    return m


def scaling(s):
    s = np.broadcast_to(np.asarray(s, np.float64), (3,))
    m = identity()
    m[0, 0], m[1, 1], m[2, 2] = s
    return m


def rotation(axis, angle_deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.deg2rad(angle_deg)
    c, s = np.cos(a), np.sin(a)
    x, y, z = axis
    K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]], np.float64)
    R = np.eye(3) + s * K + (1 - c) * (K @ K)
    m = identity()
    m[:3, :3] = R
    return m


def rotation_x(deg):
    return rotation([1.0, 0.0, 0.0], deg)


def rotation_y(deg):
    return rotation([0.0, 1.0, 0.0], deg)


def rotation_z(deg):
    return rotation([0.0, 0.0, 1.0], deg)


def look_at(position, target, up):
    """Camera/object-to-world from eye/target/up. Right-handed, matches the
    reference look_at semantics (forward = normalize(target - pos))."""
    position = np.asarray(position, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    forward = target - position
    forward = forward / np.linalg.norm(forward)
    # left-handed camera basis (+z forward, +x right on screen): verified
    # against the reference golden render (red wall on the left)
    right = np.cross(forward, up / np.linalg.norm(up))
    if np.linalg.norm(right) < 1e-8:
        # up parallel to forward; pick arbitrary right
        right = np.cross(forward, [0.0, 0.0, 1.0])
        if np.linalg.norm(right) < 1e-8:
            right = np.array([1.0, 0.0, 0.0])
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, forward)
    m = identity()
    m[:3, 0] = right
    m[:3, 1] = true_up
    m[:3, 2] = forward
    m[:3, 3] = position
    return m


def euler(yaw=0.0, pitch=0.0, roll=0.0):
    """Euler angles in degrees -> o2w (yaw about Y, pitch about X, roll about Z)."""
    return rotation_y(yaw) @ rotation_x(pitch) @ rotation_z(roll)


def trs(translate=None, rotate=None, scale=None):
    """translate * rotate(axis, angle) * scale composition."""
    m = identity()
    if scale is not None:
        m = scaling(scale) @ m
    if rotate is not None:
        axis, angle = rotate[:3], rotate[3]
        m = rotation(axis, angle) @ m
    if translate is not None:
        m = translation(translate) @ m
    return m


def apply_points(m, pts):
    """Transform [N,3] points by 4x4 m."""
    pts = np.asarray(pts, np.float64)
    return pts @ m[:3, :3].T + m[:3, 3]


def apply_vectors(m, v):
    return np.asarray(v, np.float64) @ m[:3, :3].T


def apply_normals(m, n):
    """Normals transform by inverse-transpose."""
    inv_t = np.linalg.inv(m[:3, :3]).T
    out = np.asarray(n, np.float64) @ inv_t.T
    norm = np.linalg.norm(out, axis=-1, keepdims=True)
    return out / np.maximum(norm, 1e-20)


def from_json(tdesc):
    """Parse a TransformDesc JSON node -> 4x4 numpy matrix.

    Supported types (node_desc.cpp): matrix4x4, look_at, TRS/trs, Euler, yaw.
    The reference stores matrix4x4 column-major-ish as list of rows where
    translation sits in the 4th row (D3D convention, see vision_scene.json);
    we transpose to math convention.
    """
    if tdesc is None:
        return identity()
    ttype = tdesc.get("type", "matrix4x4")
    p = tdesc.get("param", {})
    if ttype == "matrix4x4":
        m = np.asarray(p.get("matrix4x4", np.eye(4)), np.float64)
        # reference stores row-vector convention (translation in last row)
        return m.T
    if ttype == "look_at":
        return look_at(p.get("position", [0, 0, 0]),
                       p.get("target_pos", [0, 0, 1]),
                       p.get("up", [0, 1, 0]))
    if ttype in ("Euler", "euler"):
        return euler(p.get("yaw", 0.0), p.get("pitch", 0.0), p.get("roll", 0.0))
    if ttype == "yaw":
        return rotation_y(p.get("yaw", 0.0))
    if ttype in ("TRS", "trs", "SRT", "srt"):
        return trs(p.get("t"), p.get("r"), p.get("s"))
    raise ValueError(f"unknown transform type: {ttype}")
