#!/usr/bin/env python
"""Round-5 bucky-class sweep: can the driver-headline config go faster?

bench.py (the driver's headline metric) renders the bucky-class 32^3
scene at 256^2 x 20 iterations through production defaults (two-level,
min_width=128, cascade_factor=2, f32 tables).  The round-4/5 medical
and smoke sweeps found min_width=64 and fractional cascade factors
worth 2-11% on those classes; this driver measures the same knobs on
the bucky workload, plus single-level (dense 32^3 grids preferred
single-level in round 1) and q4 (expected a wash: the 32 KB table is
already in the fastest gather class).

Timing discipline per PERF.md: direct render_tile, host-readback
fences via image checksum, fresh seed per rep, rep 0 discarded.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--spp", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--out", default="benchmarks/results_bucky_r5.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from cudavolumerenderer_tpu.config import Config
    from cudavolumerenderer_tpu.models import fast
    from cudavolumerenderer_tpu.ops.camera import make_camera
    from cudavolumerenderer_tpu.scene import procedural
    from cudavolumerenderer_tpu.scene.raw_builder import albedo_from_density
    from cudavolumerenderer_tpu.scene.types import (
        RenderSettings,
        make_medium,
        make_scene,
    )

    density = procedural.blob_volume((32, 32, 32))
    albedo = albedo_from_density(density)
    scene = make_scene(make_medium(density, albedo, scale=40.0,
                                   max_density=1.0))
    res = args.res
    camera = make_camera(res, res)
    settings = RenderSettings.from_flags(True)

    sweep = [
        ("default(minw128,f2)", dict()),
        ("minw64", dict(min_width=64)),
        ("minw64+f125", dict(min_width=64, cascade_factor=1.25)),
        ("minw64+f15", dict(min_width=64, cascade_factor=1.5)),
        ("f125", dict(cascade_factor=1.25)),
        ("1L", dict(two_level_off=True)),
        ("minw64+q4", dict(min_width=64, table_bits=4)),
    ]
    if args.only:
        sweep = [(k, kw) for k, kw in sweep
                 if any(s in k for s in args.only)]
        print(f"--only: {[k for k, _ in sweep]}", flush=True)

    results = {}
    for name, kw in sweep:
        kw = dict(kw)
        two_level = not kw.pop("two_level_off", False)
        tb = kw.pop("table_bits", 32)
        # same production gate as make_kernel_fn / the CLI
        cfg = Config(table_bits=tb, allow_quantized=(tb < 32),
                     settings=settings)
        times = []
        for rep in range(args.reps + 1):
            t0 = time.time()
            out = fast.render_tile(
                scene, camera, settings, (res, res),
                jnp.zeros(2, jnp.float32), (res, res), args.spp,
                100 + rep, 0, two_level=two_level,
                table_bits=cfg.effective_table_bits, **kw,
            )
            img, n_rays = out[0], out[1]
            csum = float(jnp.asarray(img).sum())
            dt = time.time() - t0
            nr = float(n_rays)
            if rep:
                times.append(dt)
            print(f"  {name} rep{rep}: {dt:.3f}s "
                  f"({nr/dt/1e6:.2f} Mrays/s, csum {csum:.1f})",
                  flush=True)
        results[name] = {
            "times_s": [round(t, 3) for t in times],
            "mrays_per_s": round(nr / np.mean(times) / 1e6, 2),
            "precision": "reduced-q4" if tb < 32 else "f32",
        }
        print(f"{name:24s} -> {results[name]['mrays_per_s']} Mrays/s",
              flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
