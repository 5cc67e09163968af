#!/usr/bin/env python
"""Focused medical-class (256^3 @ 512^2x4) fastSK timing.

Direct render_tile timings (the PERF.md scoreboard protocol) with a
host-readback fence (block_until_ready is not a reliable fence through
the axon tunnel).  Sweeps lanes_per_pixel.  Usage:

    python benchmarks/micro_medical.py [m ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    ms = [int(a) for a in sys.argv[1:]] or [1, 2, 4]

    import jax.numpy as jnp

    from cudavolumerenderer_tpu.models import fast
    from cudavolumerenderer_tpu.ops.camera import make_camera
    from cudavolumerenderer_tpu.scene import procedural
    from cudavolumerenderer_tpu.scene.types import (
        RenderSettings,
        make_medium,
        make_scene,
    )

    d = procedural.medical_volume((256, 256, 256), n_blobs=40)
    alb = np.stack([d, 0.5 * np.ones_like(d), 1.0 - d], axis=-1)
    scene = make_scene(make_medium(d, alb, scale=100.0, max_density=1.0))
    print("albedo_affine:", scene.medium.albedo_affine is not None)

    res, iters = 512, 4
    camera = make_camera(res, res)
    settings = RenderSettings.from_flags(True)
    off = jnp.zeros(2, jnp.float32)

    for m in ms:
        seed = 1000
        img, nr = fast.render_tile(
            scene, camera, settings, (res, res), off, (res, res),
            iters, seed, 0, lanes_per_pixel=m, two_level=True,
        )
        float(img.sum())  # compile + fence
        for rep in range(3):
            seed += 1
            t0 = time.time()
            img, nr = fast.render_tile(
                scene, camera, settings, (res, res), off, (res, res),
                iters, seed, 0, lanes_per_pixel=m, two_level=True,
            )
            s = float(img.sum()) + float(nr)  # host readback fence
            dt = time.time() - t0
            print(
                f"m={m} rep={rep}: {dt:.3f}s  "
                f"{float(nr) / (dt * 1e6):.2f} Mrays/s  (sum {s:.1f})",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
