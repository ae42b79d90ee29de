"""Benchmark: cornell-box path tracing throughput (Mrays/s) on the chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Rays counted are actual traced rays (closest + shadow, active lanes only)
from the integrator's on-device counter. vs_baseline is relative to the
round-1 first measurement on a TPU v5e (fixed constant below).
"""
import json
import time

import jax
import jax.numpy as jnp

# round-1 first-light measurement on TPU v5e (this repo, commit d0d11ba era)
BASELINE_MRAYS = 1.933

RES = 512
DEPTH = 8
WARMUP = 2
ITERS = 16


def main():
    import copy
    from tests.fixtures import CBOX_JSON
    from vision_tpu.scene.scene import Scene
    from vision_tpu.integrator import pt

    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = [RES, RES]
    sc = Scene(s)

    SPP = 16

    @jax.jit
    def pass_fn(scene, camera, filt, frame0):
        img, aovs = pt.render_wave(scene, camera, filt, frame0,
                                   spp=SPP, max_depth=DEPTH)
        return img, aovs["nrays"]

    nrays_total = 0.0
    for i in range(WARMUP):
        img, nr = pass_fn(sc.data, sc.camera, sc.filter, jnp.uint32(i))
    img.block_until_ready()

    t0 = time.perf_counter()
    for i in range(ITERS):
        img, nr = pass_fn(sc.data, sc.camera, sc.filter,
                          jnp.uint32(100 + i * SPP))
        nrays_total += float(nr)
    img.block_until_ready()
    dt = time.perf_counter() - t0

    mrays = nrays_total / dt / 1e6
    print(json.dumps({
        "metric": "cbox_512_d8_pt_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    }))


if __name__ == "__main__":
    main()
