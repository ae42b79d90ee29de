"""vision_tpu: TPU-native differentiable path tracer (JAX/Pallas).

Brand-new framework with the capability set of the Vision renderer
(reference: Royalvice/Vision), re-architected for TPU: wavefront path
tracing over jnp SoA arrays, uber-BSDF material dispatch, flat light/texture
tables, Morton-BVH + dense intersection kernels, jit/grad/shard_map
throughout.
"""
__version__ = "0.1.0"

from .scene.scene import Scene, load_scene  # noqa: F401
from .render import render, render_to_file, postprocess  # noqa: F401
