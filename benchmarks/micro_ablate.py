#!/usr/bin/env python
"""Ablation: how much of the medical-class iteration cost is the GGX
boundary machinery vs the tracking gathers?  Runs medical-2L with
bsdf ggx/null and RR on/off.

--regen-levels instead times regenerationSK at the three granularity
levels (thread / 8-lane sublane group / 1024-lane row — the
REGENERATION_SYNCHRONIZATION_LEVEL axis of thesis Tables 4.3-4.4).
ARCHITECTURE.md predicts a strict thread >= warp >= block ordering on
TPU; this measures it."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def regen_levels():
    import jax.numpy as jnp

    from cudavolumerenderer_tpu.models import regeneration
    from cudavolumerenderer_tpu.ops.camera import make_camera
    from cudavolumerenderer_tpu.scene import procedural
    from cudavolumerenderer_tpu.scene.raw_builder import albedo_from_density
    from cudavolumerenderer_tpu.scene.types import (
        RenderSettings,
        make_medium,
        make_scene,
    )

    d = procedural.blob_volume((32, 32, 32))
    scene = make_scene(
        make_medium(d, albedo_from_density(d), scale=40.0, max_density=1.0)
    )
    res, spp = 256, 20
    camera = make_camera(res, res)
    settings = RenderSettings.from_flags(True)
    for group in (1, 8, 1024):
        times, rays = [], 0.0
        for rep in range(4):
            t0 = time.perf_counter()
            img, nr = regeneration.render_tile(
                scene, camera, settings, (res, res),
                jnp.zeros(2, jnp.float32), (res, res), spp, 100 + rep, 0,
                n_lanes=1 << 16, refill_group=group,
            )
            rays = float(nr)
            _ = float(img.sum())
            dt = time.perf_counter() - t0
            if rep > 0:
                times.append(dt)
        print(
            f"refill_group={group:5d}  {[round(t,2) for t in times]} s"
            f" -> {rays/min(times)/1e6:6.2f} Mrays/s",
            flush=True,
        )


def main():
    if "--regen-levels" in sys.argv:
        return regen_levels()
    import jax.numpy as jnp

    from cudavolumerenderer_tpu.models import fast
    from cudavolumerenderer_tpu.ops.camera import make_camera
    from cudavolumerenderer_tpu.scene import procedural
    from cudavolumerenderer_tpu.scene.types import (
        RenderSettings,
        make_medium,
        make_scene,
    )

    d = procedural.blob_volume((256, 256, 256), n_blobs=40)
    alb = np.stack([d, 0.5 * np.ones_like(d), 1.0 - d], axis=-1)
    scene = make_scene(make_medium(d, alb, scale=100.0, max_density=1.0))
    res, iters = 512, 4
    camera = make_camera(res, res)

    for bsdf in ("ggx", "null"):
        for rr in (True, False):
            settings = RenderSettings.from_flags(
                True, bsdf_kind=bsdf, russian_roulette=rr
            )
            args = dict(
                scene=scene, camera=camera, settings=settings,
                tile_dim=(res, res),
                tile_offset=jnp.zeros(2, jnp.float32),
                full_resolution=(res, res), spp=iters,
                two_level=True, with_stats=True,
            )
            out = fast.render_tile(seed=1, path_id_base=0, **args)
            _ = float(out[0].sum())
            t0 = time.perf_counter()
            out = fast.render_tile(seed=77, path_id_base=0, **args)
            _ = float(out[0].sum())
            dt = time.perf_counter() - t0
            n_rays, rows = float(out[1]), float(out[2])
            print(
                f"bsdf={bsdf:4s} rr={int(rr)} time={dt:7.3f}s "
                f"Mrays/s={n_rays/dt/1e6:6.2f} rows/s={rows/dt/1e6:6.1f}M",
                flush=True,
            )


if __name__ == "__main__":
    main()
