"""Command-line renderer.

Replaces the reference CLI (`/root/reference/src/base/cli_parser.cpp`):
  -s/--scene scene.json   -o/--output out.png   --spp N   --device cpu|tpu
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser("vision-tpu",
                                 description="TPU-native path tracer")
    ap.add_argument("-s", "--scene", required=True, help="scene JSON(C) file")
    ap.add_argument("-o", "--output", default=None, help="output image path")
    ap.add_argument("--spp", type=int, default=None, help="samples per pixel")
    ap.add_argument("-d", "--device", default=None, choices=["cpu", "tpu"],
                    help="force platform (default: best available)")
    ap.add_argument("--denoise", action="store_true",
                    help="apply the post denoiser before tonemap")
    ap.add_argument("--distributed", action="store_true",
                    help="initialize the JAX multi-process runtime "
                         "(multi-host pods; run one process per host)")
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.distributed:
        from .parallel import launch
        if not launch.init_distributed():
            # the user explicitly asked for multi-host: a silent single-host
            # fallback would burn pod time rendering N duplicate images
            raise SystemExit(
                "--distributed: jax.distributed.initialize() failed "
                "(check coordinator address / process env)")

    from .scene.scene import load_scene
    from .render import render, postprocess
    from .sensor import film

    t0 = time.time()
    scene = load_scene(args.scene)
    if not args.quiet:
        print(f"scene loaded: {scene.data.tri_p0.shape[0]} tris, "
              f"{scene.data.materials.kd.shape[0]} materials, "
              f"{scene.data.lights.n_lights} lights "
              f"({time.time() - t0:.2f}s)")

    hdr = render(scene, spp=args.spp, verbose=not args.quiet)
    if args.denoise:
        from .post.denoise import denoise_simple
        hdr = denoise_simple(hdr)
    img = postprocess(scene, hdr)
    out = args.output or scene.output_fn
    if out.endswith(".exr"):
        film.to_exr(hdr, out)
    else:
        film.to_png(img, out)
    if not args.quiet:
        print(f"wrote {out} ({time.time() - t0:.2f}s total)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
