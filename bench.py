#!/usr/bin/env python
"""Benchmark entry point for the driver.

Renders the BASELINE.json PR1 config (bucky-class 32^3 raw dense grid,
256x256, 20 iterations) with the streaming wavefront scheduler and reports
Mrays/s.  Baseline: the reference's best bucky number, regenerationSK
(thread) at 10.96 Mrays/s on the GT 650M (BASELINE.md, thesis Table 6.3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax

    from cudavolumerenderer_tpu.config import Config, Kernel
    from cudavolumerenderer_tpu.models.renderer import create_renderer
    from cudavolumerenderer_tpu.ops.camera import make_camera
    from cudavolumerenderer_tpu.scene import procedural
    from cudavolumerenderer_tpu.scene.raw_builder import albedo_from_density
    from cudavolumerenderer_tpu.scene.types import (
        RenderSettings,
        make_medium,
        make_scene,
    )

    # bucky-class scene: 32^3 raw semantics (synthetic stand-in for the
    # LFS-stubbed Bucky.raw), transfer-function albedo, scale 40.
    density = procedural.blob_volume((32, 32, 32))
    albedo = albedo_from_density(density)
    medium = make_medium(density, albedo, scale=40.0, max_density=1.0)
    scene = make_scene(medium)

    res = 256
    iterations = 20
    camera = make_camera(res, res)
    config = Config(
        kernel=Kernel.FAST_SK,
        iterations=iterations,
        resolution=(res, res),
        n_tiles=(1, 1),
        n_lanes=1 << 17,
        two_level=True,  # sparse-leap + cascade: best mode on all classes
        # fractional cascade: finer pool shrink steps compact idle lanes
        # out earlier (round-5 bucky sweep: 27.3 vs 25.2 Mrays/s at the
        # default factor 2 — benchmarks/results_bucky_r5.json)
        cascade_factor=1.25,
        settings=RenderSettings.from_flags(True),
    )
    renderer = create_renderer(scene, camera, config)

    # warmup (compile)
    renderer.render()

    def timed_render() -> float:
        """Render and return Mrays/s, fencing on the on-device ray
        counter.  The reference's runTest times the render phase apart
        from image save (Main.cpp:64-97); we likewise exclude the final
        image download, which through the axon tunnel costs ~70 ms for
        768 KB — an artifact of this environment, not of the renderer
        (benchmarks/micro_driver_overhead.py)."""
        renderer.init_rendering()
        t0 = time.time()
        while not renderer.image_complete():
            renderer.run_iterations(spp=renderer._spp_per_launch())
        n_rays = renderer.n_rays  # scalar host readback = full fence
        elapsed = time.time() - t0
        if n_rays < 1e5:
            return 0.0
        return n_rays / (elapsed * 1e6)

    # Reference protocol (Main.cpp:100-119): N trials, discard the
    # first, report the MEAN.  Fresh seed per trial so the tunnel cannot
    # reuse results for identical repeat executions (PERF.md pitfall).
    trials = []
    for _ in range(4):
        config.seed += 1
        trials.append(timed_render())
    mrays = sum(trials[1:]) / len(trials[1:])

    baseline_mrays = 10.96  # reference regenerationSK(thread), bucky 32^3
    print(
        json.dumps(
            {
                "metric": "Mrays/s bucky32 256px 20it (fastSK wavefront)",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / baseline_mrays, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
