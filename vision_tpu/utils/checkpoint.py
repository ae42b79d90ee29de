"""Render-state checkpoint/resume.

New capability vs the reference (SURVEY.md §5: "no render-state
checkpointing"): the full progressive-render state — accumulation buffer,
frame index, RNG config, adaptive-sampling state, optimizer state for
inverse rendering — is a pytree, so checkpointing is a structured save of
numpy leaves. Survives interruption mid-render; resume continues the exact
sample sequence (counter-based RNG keys off frame index).
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp


def save_checkpoint(path, accum, frame_index, extra=None):
    """Save progressive render state. extra: dict of additional pytrees
    (inspector state, optimizer state, SVGF state...)."""
    payload = {"accum": np.asarray(accum),
               "frame_index": np.asarray(frame_index)}
    meta = {"keys": []}
    if extra:
        flat = _flatten("extra", extra)
        for k, v in flat.items():
            payload[k] = np.asarray(v)
            meta["keys"].append(k)
    np.savez_compressed(path, **payload)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path):
    """Returns (accum, frame_index, extra_dict)."""
    data = np.load(path, allow_pickle=False)
    accum = jnp.asarray(data["accum"])
    frame_index = int(data["frame_index"])
    extra = {}
    for k in data.files:
        if k.startswith("extra/"):
            _insert(extra, k.split("/")[1:], jnp.asarray(data[k]))
    return accum, frame_index, extra


def _flatten(prefix, tree):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(f"{prefix}/{k}", v))
    elif hasattr(tree, "__dict__") and not hasattr(tree, "shape"):
        for k, v in vars(tree).items():
            out.update(_flatten(f"{prefix}/{k}", v))
    else:
        out[prefix] = tree
    return out


def _insert(d, keys, value):
    for k in keys[:-1]:
        d = d.setdefault(k, {})
    d[keys[-1]] = value


def render_resumable(scene, spp, checkpoint_path, checkpoint_every=32,
                     verbose=False):
    """Progressive render that checkpoints every N spp and resumes from an
    existing checkpoint file."""
    from ..render import _render_pass
    from ..sensor import film

    accum = None
    start = 0
    if os.path.exists(checkpoint_path):
        accum, start, _ = load_checkpoint(checkpoint_path)
        if verbose:
            print(f"resuming at spp {start}")
    for frame in range(start, spp):
        img, _ = _render_pass(scene.data, scene.camera, scene.filter,
                              jnp.uint32(frame), scene.max_depth,
                              scene.min_depth, jnp.float32(scene.rr_threshold))
        accum = img if accum is None else film.accumulate(
            accum, img, jnp.float32(frame))
        if (frame + 1) % checkpoint_every == 0 or frame + 1 == spp:
            save_checkpoint(checkpoint_path, accum, frame + 1)
    return np.asarray(accum)
