"""vision_tpu: TPU-native differentiable path tracer (JAX/Pallas).

Brand-new framework with the capability set of the Vision renderer
(reference: Royalvice/Vision), re-architected for TPU: wavefront path
tracing over jnp SoA arrays, uber-BSDF material dispatch, flat light/texture
tables, Morton-BVH + dense intersection kernels, jit/grad/shard_map
throughout.
"""
__version__ = "0.1.0"

import os as _os

import jax as _jax

# TPU matmuls default to bf16-truncated inputs; the renderer routes
# GEOMETRY (triangle positions/normals) through one-hot-matmul row fetches
# (core/gather.py), and bf16-quantized positions break the shadow-ray
# offset (~11% energy loss vs CPU measured on cbox). Renderer math is
# exact-f32 everywhere; kernels that can tolerate bf16 opt in locally.
# This is process-global (it must reach every jit trace that touches
# renderer geometry); host apps embedding the renderer alongside bf16-happy
# JAX code can opt out with VT_EXACT_MATMUL=0 and accept the energy error.
if _os.environ.get("VT_EXACT_MATMUL", "1") != "0":
    _jax.config.update("jax_default_matmul_precision", "highest")

from .scene.scene import Scene, load_scene  # noqa: F401
from .render import render, render_to_file, postprocess  # noqa: F401
