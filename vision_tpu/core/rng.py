"""Counter-based, stateless-per-draw device RNG.

TPU-native equivalent of the reference independent sampler
(`/root/reference/src/render_core/samplers/` — TEA-hashed LCG per pixel):
a PCG-hash stream keyed by (pixel_index, sample_index). The state is a plain
uint32 array carried through the wavefront loop as part of the ray-state
pytree, so sequences are exactly replayable for path-replay backprop and
deterministic across shardings (each lane owns its own stream).
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def _pcg_hash(x):
    """PCG output hash; one round is enough to decorrelate lane seeds."""
    x = x.astype(_U32)
    state = x * _U32(747796405) + _U32(2891336453)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    return (word >> _U32(22)) ^ word


def seed(pixel_index, sample_index, stream=0):
    """Initial per-lane state from pixel id + sample id (+ named stream).

    Mirrors the decorrelation role of the reference TEA hash: distinct
    (pixel, sample) pairs produce independent sequences.
    """
    a = _pcg_hash(jnp.asarray(pixel_index).astype(_U32))
    b = _pcg_hash(jnp.asarray(sample_index).astype(_U32) + _U32(0x9E3779B9))
    s = a ^ (b + _U32(0x85EBCA6B) + (a << _U32(6)) + (a >> _U32(2)))
    if stream:
        s = _pcg_hash(s ^ _U32(stream * 0x9E3779B1))
    return s


def next_state(state):
    """Advance the LCG state."""
    return state * _U32(747796405) + _U32(2891336453)


def _to_float(word):
    # top 24 bits -> [0, 1); float32-exact
    return (word >> _U32(8)).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def next_1d(state):
    """(new_state, u) with u uniform in [0,1)."""
    state = next_state(state)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    word = (word >> _U32(22)) ^ word
    return state, _to_float(word)


def next_2d(state):
    state, u0 = next_1d(state)
    state, u1 = next_1d(state)
    return state, jnp.stack([u0, u1], axis=-1)


def next_3d(state):
    state, u0 = next_1d(state)
    state, u1 = next_1d(state)
    state, u2 = next_1d(state)
    return state, jnp.stack([u0, u1, u2], axis=-1)
