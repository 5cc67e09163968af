"""Measure where renderer.render() time goes vs direct render_tile.

Breakdown of the bench.py driver path (bucky config) to locate the
14-vs-22 Mrays/s delta noted in NEXT_STEPS.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudavolumerenderer_tpu.config import Config, Kernel
from cudavolumerenderer_tpu.models import fast
from cudavolumerenderer_tpu.models.renderer import create_renderer
from cudavolumerenderer_tpu.ops.camera import make_camera
from cudavolumerenderer_tpu.scene import procedural
from cudavolumerenderer_tpu.scene.raw_builder import albedo_from_density
from cudavolumerenderer_tpu.scene.types import (
    RenderSettings, make_medium, make_scene,
)


def main():
    print("devices:", jax.devices(), flush=True)
    density = procedural.blob_volume((32, 32, 32))
    albedo = albedo_from_density(density)
    medium = make_medium(density, albedo, scale=40.0, max_density=1.0)
    scene = make_scene(medium)
    res, iters = 256, 20
    camera = make_camera(res, res)
    settings = RenderSettings.from_flags(True)
    config = Config(
        kernel=Kernel.FAST_SK, iterations=iters, resolution=(res, res),
        n_tiles=(1, 1), n_lanes=1 << 17, two_level=True, settings=settings,
    )

    # --- direct path ---------------------------------------------------
    off = jnp.asarray([0.0, 0.0], jnp.float32)
    def direct(seed):
        img, n_rays = fast.render_tile(
            scene, camera, settings, (res, res), off, (res, res),
            iters, seed, 0, lanes_per_pixel=1, two_level=True,
        )
        return img, n_rays

    img, n_rays = direct(0)
    fence = float(n_rays)  # warm compile + readback fence
    print("compiled; n_rays:", fence, flush=True)
    for rep in range(3):
        t0 = time.time()
        img, n_rays = direct(rep + 1)
        nr = float(n_rays)  # scalar fence
        dt = time.time() - t0
        print(f"direct rep{rep}: {dt:.3f}s  {nr/dt/1e6:.2f} Mrays/s", flush=True)

    # same but fence with full image readback
    for rep in range(2):
        t0 = time.time()
        img, n_rays = direct(10 + rep)
        host = np.asarray(img)
        nr = float(n_rays)
        dt = time.time() - t0
        print(f"direct+img rep{rep}: {dt:.3f}s  {nr/dt/1e6:.2f} Mrays/s", flush=True)

    # --- driver path ----------------------------------------------------
    renderer = create_renderer(scene, camera, config)
    renderer.render()  # warm
    for rep in range(3):
        config.seed += 1
        t0 = time.time()
        renderer.render()
        dt = time.time() - t0
        nr = renderer.n_rays
        print(f"driver rep{rep}: {dt:.3f}s  {nr/dt/1e6:.2f} Mrays/s", flush=True)

    # driver minus get_image
    for rep in range(2):
        config.seed += 1
        t0 = time.time()
        renderer.init_rendering()
        while not renderer.image_complete():
            renderer.run_iterations(spp=renderer._spp_per_launch())
        nr = renderer.n_rays  # scalar fence only
        dt = time.time() - t0
        print(f"driver-noimg rep{rep}: {dt:.3f}s  {nr/dt/1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
