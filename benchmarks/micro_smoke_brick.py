#!/usr/bin/env python
"""brickSK v2 tuning on its natural class: high optical depth (smoke,
scale 800), where rays take ~25-100 Woodcock steps per 4x4x8 brick and
the per-round sort/pack overhead amortizes over many in-kernel steps.

Sweeps k_steps (kernel steps per round) against the fastSK-2L champion.
Done-criterion (VERDICT r1 item 2): brickSK >= fastSK on at least one
scene class.
"""

import argparse
import json
import time

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--res", type=int, default=400)
    parser.add_argument("--spp", type=int, default=4)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--k", type=int, nargs="+",
                        default=[8, 32, 64, 128])
    parser.add_argument("--out", default="benchmarks/results_smoke_brick.json")
    args = parser.parse_args()

    import jax.numpy as jnp

    from cudavolumerenderer_tpu.models import brick, fast
    from cudavolumerenderer_tpu.ops.camera import make_camera
    from cudavolumerenderer_tpu.scene import procedural
    from cudavolumerenderer_tpu.scene.types import (
        RenderSettings,
        make_medium,
        make_scene,
    )

    d = procedural.smoke_volume((128, 128, 50))
    alb = np.stack([d, d, d], axis=-1) * 0.9
    scene = make_scene(
        make_medium(d, alb, scale=800.0, max_density=float(d.max()))
    )
    res = args.res
    camera = make_camera(res, res)
    settings = RenderSettings.from_flags(True)
    common = (
        scene, camera, settings, (res, res), jnp.zeros(2, jnp.float32),
        (res, res), args.spp,
    )

    def timed(fn, label, **kw):
        times, rays = [], 0.0
        for rep in range(args.reps + 1):
            t0 = time.perf_counter()
            img, nr = fn(*common, 100 + rep, 0, **kw)
            rays = float(nr)
            _ = float(img.sum())
            dt = time.perf_counter() - t0
            if rep > 0:
                times.append(dt)
        mrays = rays / min(times) / 1e6
        print(f"{label:24s} {[round(t,2) for t in times]} s"
              f" -> {mrays:6.2f} Mrays/s", flush=True)
        return {"times_s": [round(t, 3) for t in times],
                "mrays_per_s": round(mrays, 2)}

    results = {}
    results["fastSK-2L"] = timed(
        fast.render_tile, "fastSK-2L", two_level=True
    )
    for k in args.k:
        results[f"brickSK k={k}"] = timed(
            brick.render_tile, f"brickSK k={k}", k_steps=k
        )

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    sys.exit(main())
