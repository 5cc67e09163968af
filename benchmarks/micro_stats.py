#!/usr/bin/env python
"""Wavefront anatomy: iterations, busy-lane fraction, effective gather-row
rate for fastSK (1L and 2L) on each benchmark scene class.

Interprets a render as n_iters full-width gather rounds: per-iteration
cost ~ n_lanes / gather_rate.  Prints where the time goes so the split-
table / leap-channel redesign can be sized (see micro_gather.py).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
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

    settings = RenderSettings.from_flags(True)
    for name, mk in [("bucky", bucky), ("smoke", smoke),
                     ("medical", medical)]:
        scene, res, iters = mk()
        camera = make_camera(res, res)
        for two_level in (False, True):
            args = dict(
                scene=scene, camera=camera, settings=settings,
                tile_dim=(res, res),
                tile_offset=jnp.zeros(2, jnp.float32),
                full_resolution=(res, res), spp=iters,
                two_level=two_level, with_stats=True,
            )
            out = fast.render_tile(seed=1, path_id_base=0, **args)
            _ = float(out[0].sum())  # sync via readback
            t0 = time.perf_counter()
            out = fast.render_tile(seed=99, path_id_base=0, **args)
            img_sum = float(out[0].sum())
            dt = time.perf_counter() - t0
            n_rays = float(out[1])
            rows = float(out[2])  # lane-rows: sum of pool width per iter
            n_busy = float(out[3])
            n_lanes = res * res
            n_iters = rows / n_lanes  # full-width-equivalent iterations
            print(
                f"{name:8s} 2L={int(two_level)} time={dt:7.3f}s "
                f"rays={n_rays/1e6:7.2f}M iters~={n_iters:7.0f} "
                f"busy={n_busy/rows*100:5.1f}% "
                f"Mrays/s={n_rays/dt/1e6:7.2f} "
                f"rows/s(all)={rows/dt/1e6:7.1f}M "
                f"rows/ray={rows/n_rays:6.1f} "
                f"busyrows/ray={n_busy/n_rays:5.1f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
