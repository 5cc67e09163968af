#!/usr/bin/env python
"""Per-class fastSK-2L timings (bucky / smoke / medical) with per-rep
prints and host-readback fences — the PERF.md scoreboard protocol.

    python benchmarks/micro_classes.py [bucky] [smoke] [medical]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    which = sys.argv[1:] or ["bucky", "smoke", "medical"]

    import jax.numpy as jnp

    from cudavolumerenderer_tpu.models import fast
    from cudavolumerenderer_tpu.ops.camera import make_camera
    from cudavolumerenderer_tpu.scene import procedural
    from cudavolumerenderer_tpu.scene.raw_builder import albedo_from_density
    from cudavolumerenderer_tpu.scene.types import (
        RenderSettings,
        make_medium,
        make_scene,
    )

    def bucky():
        d = procedural.blob_volume((32, 32, 32))
        return make_scene(
            make_medium(d, albedo_from_density(d), scale=40.0,
                        max_density=1.0)
        ), 256, 20

    def smoke():
        d = procedural.smoke_volume((128, 128, 50))
        alb = np.stack([d, d, d], axis=-1) * 0.9
        return make_scene(
            make_medium(d, alb, scale=800.0, max_density=float(d.max()))
        ), 400, 4

    def medical():
        d = procedural.medical_volume((256, 256, 256), n_blobs=40)
        alb = np.stack([d, 0.5 * np.ones_like(d), 1.0 - d], axis=-1)
        return make_scene(
            make_medium(d, alb, scale=100.0, max_density=1.0)
        ), 512, 4

    for name in which:
        scene, res, iters = {"bucky": bucky, "smoke": smoke,
                             "medical": medical}[name]()
        print(
            f"{name}: affine={scene.medium.albedo_affine is not None}",
            flush=True,
        )
        camera = make_camera(res, res)
        settings = RenderSettings.from_flags(True)
        off = jnp.zeros(2, jnp.float32)
        seed = 700
        for label, kw in (
            ("casc=4", dict()),
            ("casc=2", dict(cascade_factor=2)),
        ):
            img, nr = fast.render_tile(
                scene, camera, settings, (res, res), off, (res, res),
                iters, seed, 0, two_level=True, **kw,
            )
            float(img.sum())  # compile + fence
            for rep in range(3):
                seed += 1
                t0 = time.time()
                img, nr = fast.render_tile(
                    scene, camera, settings, (res, res), off, (res, res),
                    iters, seed, 0, two_level=True, **kw,
                )
                s = float(img.sum()) + float(nr)
                dt = time.time() - t0
                print(
                    f"{name} {res}^2x{iters} {label} rep={rep}: {dt:.3f}s"
                    f"  {float(nr) / (dt * 1e6):.2f} Mrays/s"
                    f"  (sum {s:.1f})",
                    flush=True,
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
