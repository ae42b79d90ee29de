"""Device debugging + observability utilities.

Equivalents of the reference aux subsystems (SURVEY.md §5):
  Env::printer()            -> jax.debug.print wrappers
  Env::debugger() pixel-range conditional execution -> pixel_debug_mask
  Env::set_valid_check NaN checking -> checkify/validate_radiance
  MemoryStats               -> scene_memory_stats
  TIMER()/Clock             -> ScopeTimer
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


class ScopeTimer:
    """TIMER(name) equivalent (base timing macro)."""

    def __init__(self, name, verbose=True):
        self.name = name
        self.verbose = verbose

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.elapsed = time.perf_counter() - self.t0
        if self.verbose:
            print(f"[timer] {self.name}: {self.elapsed * 1e3:.2f} ms")


def pixel_debug_mask(resolution, lo, hi):
    """Boolean lane mask for a pixel rectangle — the wavefront analog of
    Env::debugger() $condition_execute ranges (pipeline.cpp:43-54)."""
    W, H = resolution
    pix = jnp.arange(W * H)
    px = pix % W
    py = pix // W
    return ((px >= lo[0]) & (px < hi[0]) & (py >= lo[1]) & (py < hi[1]))


def debug_print_where(mask, fmt, *values):
    """Per-lane conditional device print (Env::printer + $condition_info):
    prints reduced stats of the masked lanes."""
    for i, v in enumerate(values):
        sel = jnp.where(mask, v, jnp.nan) if v.ndim == 1 else \
            jnp.where(mask[..., None], v, jnp.nan)
        jax.debug.print(fmt + " [value {i}] mean={m} min={lo} max={hi}",
                        i=i, m=jnp.nanmean(sel), lo=jnp.nanmin(sel),
                        hi=jnp.nanmax(sel))


def validate_radiance(L, name="radiance"):
    """NaN/Inf/negative check (Env::set_valid_check). Host-side assert."""
    a = np.asarray(L)
    stats = {
        "nan": int(np.isnan(a).sum()),
        "inf": int(np.isinf(a).sum()),
        "negative": int((a < 0).sum()),
    }
    ok = not any(stats.values())
    return ok, stats


def scene_memory_stats(scene_data):
    """Byte accounting of device-resident scene arrays (MemoryStats UI,
    pipeline.cpp:211-260)."""
    stats = {}

    def walk(prefix, obj):
        if hasattr(obj, "shape") and hasattr(obj, "dtype"):
            stats[prefix] = int(np.prod(obj.shape)) * obj.dtype.itemsize
        elif hasattr(obj, "__dataclass_fields__"):
            for k in obj.__dataclass_fields__:
                walk(f"{prefix}.{k}" if prefix else k, getattr(obj, k))

    walk("", scene_data)
    stats["TOTAL"] = sum(v for k, v in stats.items() if k != "TOTAL")
    return stats
