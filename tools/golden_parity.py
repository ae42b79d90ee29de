"""Golden-parity ladder runner (BASELINE.md targets): renders on the real
chip at high spp and reports PSNR vs the reference's shipped ground truths.

Usage: python tools/golden_parity.py [--spp N] [--res R]

Configs covered:
  1. cbox (fixture == classic cornell box) vs TungstenRender.png
  2. cbox-glass variant (ladder config 2) — renders + sanity stats
     (no external golden shipped for it)
Writes a markdown row summary to stdout suitable for PARITY.md.
"""
import argparse
import copy
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def srgb(x):
    x = np.clip(x, 0, 1)
    return np.where(x <= 0.0031308, x * 12.92,
                    1.055 * np.power(np.maximum(x, 1e-8), 1 / 2.4) - 0.055)


def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def render(scene, spp, depth):
    import jax
    import jax.numpy as jnp
    from vision_tpu.integrator import pt
    fn = jax.jit(lambda sd, c, f, i: pt.render_sample(sd, c, f, i,
                                                      max_depth=depth)[0])
    acc = 0.0
    t0 = time.time()
    for i in range(spp):
        acc = acc + fn(scene.data, scene.camera, scene.filter, jnp.uint32(i))
    img = np.asarray(acc / spp)
    return img, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--depth", type=int, default=16)
    args = ap.parse_args()

    from PIL import Image
    from tests.fixtures import CBOX_JSON, make_glass_cbox
    from vision_tpu.scene.scene import Scene

    rows = []

    # config 1: classic cbox vs Tungsten golden
    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = \
        [args.res, args.res]
    sc = Scene(s)
    img, dt = render(sc, args.spp, args.depth)
    out = srgb(img)
    g = np.asarray(Image.open(
        "/root/reference/res/render_scene/cbox/TungstenRender.png"
    ))[..., :3].astype(np.float32) / 255.0
    k = 1024 // args.res
    g = g.reshape(args.res, k, args.res, k, 3).mean((1, 3))
    p = psnr(out, g)
    Image.fromarray((out * 255).astype(np.uint8)).save("/tmp/parity_cbox.png")
    rows.append(("cbox vs TungstenRender.png",
                 f"{p:.2f} dB @ {args.spp}spp d{args.depth}", f"{dt:.0f}s"))

    # config 2: glass/mirror cbox — renders finite + energy sane
    sg = make_glass_cbox()
    sg["camera"]["param"]["radiance_collector"]["param"]["resolution"] = \
        [args.res, args.res]
    scg = Scene(sg)
    img2, dt2 = render(scg, max(args.spp // 4, 16), args.depth)
    ok = np.isfinite(img2).all() and 0.01 < srgb(img2).mean() < 0.9
    rows.append(("cbox-glass (mesh/dielectric)",
                 f"finite={bool(np.isfinite(img2).all())} "
                 f"mean={srgb(img2).mean():.3f} sane={ok}", f"{dt2:.0f}s"))

    print("| config | result | time |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r[0]} | {r[1]} | {r[2]} |")


if __name__ == "__main__":
    main()
