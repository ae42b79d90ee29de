"""Generate repo-internal HDR goldens on the chip (high spp, linear
radiance, block-averaged). These give the tight regression net BASELINE
asks for: future renders must match them to ~noise level in LINEAR HDR,
independent of the Tungsten PNG's unknown tonemap chain.

Usage: python tools/gen_golden.py [out_dir]
Writes tests/goldens/{cbox_hdr,prism_hdr}.npz: img [N, N, 3] f32 linear.
"""
import os
import sys
import time

sys.path.insert(0, ".")
import numpy as np


def block_mean(img, out_res):
    k = img.shape[0] // out_res
    return img.reshape(out_res, k, out_res, k, 3).mean((1, 3))


def main():
    import copy
    import jax.numpy as jnp
    from tests.fixtures import CBOX_JSON
    from vision_tpu.scene.scene import Scene
    from vision_tpu.render import render

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "tests/goldens"
    os.makedirs(out_dir, exist_ok=True)

    # cbox 512^2 1024spp (BASELINE config 1 at full quality)
    s = copy.deepcopy(CBOX_JSON)
    s["camera"]["param"]["radiance_collector"]["param"]["resolution"] = \
        [512, 512]
    sc = Scene(s)
    t0 = time.time()
    img = render(sc, spp=1024)
    print(f"cbox 512^2 1024spp: {time.time()-t0:.1f}s mean={img.mean():.5f}")
    np.savez_compressed(os.path.join(out_dir, "cbox_hdr.npz"),
                        img=block_mean(img, 128).astype(np.float32),
                        res=512, spp=1024, depth=sc.max_depth)

    # prism hero-dispersion 256^2 256spp (BASELINE config 3)
    prism = "/root/reference/res/render_scene/cbox/cbox-prism.json"
    if os.path.exists(prism):
        sc = Scene(prism)
        sc.raw["camera"]["param"]["radiance_collector"]["param"][
            "resolution"] = [256, 256]
        sc = Scene(sc.raw, scene_dir=sc.scene_dir)
        t0 = time.time()
        img = render(sc, spp=256)
        print(f"prism 256^2 256spp: {time.time()-t0:.1f}s "
              f"mean={img.mean():.5f}")
        np.savez_compressed(os.path.join(out_dir, "prism_hdr.npz"),
                            img=block_mean(img, 64).astype(np.float32),
                            res=256, spp=256, depth=sc.max_depth)


if __name__ == "__main__":
    main()
