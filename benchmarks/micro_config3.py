#!/usr/bin/env python
"""BASELINE config 3 (hetvol-VDB 1024^2): target derivation + sweep.

VERDICT r4 weak item 5: the committed 12.43 Mrays/s was compared to
thesis T6.2's 17.41, but that reference row is the 400^2 smoke scene at
density scale 800 — config 3 renders the same 128x128x50 grid through
the VDB conventions (scale 100, unit AABB) at 1024^2, a different
workload on both axes.  This driver produces the pieces of an honest
reference-normalized verdict:

  1. f_res  = ours(1024^2) / ours(400^2) on the EXACT config-3 scene
     (same loader, same physics) — how much of the 12.43-vs-25.7 gap is
     resolution arithmetic;
  2. f_scale = ours(scale 100) / ours(scale 800) at 400^2 on the same
     grid — how much is the optical-depth change from the VDB scale
     convention;
  3. a config sweep at 1024^2 (q4 / min_width / fractional cascade /
     single-level) to optimize the config itself.

The defended target (recorded in the JSON): the reference's persistent-
thread kernels are throughput-bound and roughly resolution-neutral, so
the reference-extrapolated bar for config 3 is T6.2's best (17.41
Mrays/s) adjusted by the reference's OWN scale sensitivity — which we
cannot measure (no GPU); we therefore hold the bar at 17.41 flat and
report our number against it alongside the f_res/f_scale decomposition.

Timing discipline per PERF.md: host-readback fences, fresh seeds per
rep, rep 0 discarded.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--out", default="benchmarks/results_config3.json")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="tiny resolutions (CPU smoke test)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from baseline_configs import _write_hetvol_vdb
    from cudavolumerenderer_tpu.config import Config
    from cudavolumerenderer_tpu.models import fast
    from cudavolumerenderer_tpu.ops.camera import make_camera
    from cudavolumerenderer_tpu.scene.vdb import load_vdb_scene
    from cudavolumerenderer_tpu.scene.types import RenderSettings

    tmp = "/tmp/baseline_cfg"
    os.makedirs(tmp, exist_ok=True)
    path = _write_hetvol_vdb(tmp)
    scene, _ = load_vdb_scene(path)  # scale 100, unit AABB (VDB conv)
    settings = RenderSettings.from_flags(True)
    # scale-800 variant of the SAME grid (smoke-class optical depth)
    med800 = scene.medium._replace(
        scale=jnp.asarray(800.0, jnp.float32)
    )
    scene800 = scene._replace(medium=med800)

    r_lo, r_hi = (64, 128) if args.quick else (400, 1024)
    base = dict(two_level=True, cascade_factor=2)
    rows = [
        # name, scene, res, extra kwargs
        ("s100_400_base", scene, r_lo, dict(**base)),
        ("s100_1024_base", scene, r_hi, dict(**base)),
        ("s800_400_base", scene800, r_lo, dict(**base)),
        ("s100_1024_q4", scene, r_hi, dict(**base, table_bits=4)),
        ("s100_1024_q4_minw64", scene, r_hi,
         dict(**base, table_bits=4, min_width=64)),
        ("s100_1024_q4_f15", scene, r_hi,
         dict(two_level=True, cascade_factor=1.5, table_bits=4)),
        # scale 100 is optically thin — single-level may win (no brick
        # probes on a medium most rays cross in a few steps)
        ("s100_1024_1l", scene, r_hi, dict(two_level=False)),
        ("s100_1024_1l_q4", scene, r_hi,
         dict(two_level=False, table_bits=4)),
    ]
    if args.only:
        rows = [r for r in rows if any(s in r[0] for s in args.only)]

    results = {}
    for name, sc, res, kw in rows:
        kw = dict(kw)
        kw["table_bits"] = Config(
            table_bits=kw.get("table_bits", 32),
            allow_quantized=True, settings=settings,
        ).effective_table_bits
        camera = make_camera(res, res)
        times, rays = [], 0.0
        seed = 500
        for rep in range(args.reps + 1):
            seed += 1
            t0 = time.time()
            img, nr = fast.render_tile(
                sc, camera, settings, (res, res),
                jnp.zeros(2, jnp.float32), (res, res), args.spp,
                seed, 0, **kw,
            )
            s = float(img.sum())
            dt = time.time() - t0
            rays = float(nr)
            if rep:
                times.append(dt)
            print(f"{name} rep{rep}: {dt:.3f}s "
                  f"{rays / (dt * 1e6):.2f} Mrays/s (sum {s:.1f})",
                  flush=True)
        best = min(times)
        results[name] = {
            "s": round(best, 4),
            "mrays_s": round(rays / best / 1e6, 2),
            "res": res,
            "precision": (
                f"reduced-q{kw['table_bits']}"
                if kw["table_bits"] < 32 else "full-f32"
            ),
        }
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    # derivation block
    d = {}
    if "s100_400_base" in results and "s100_1024_base" in results:
        d["f_res"] = round(
            results["s100_1024_base"]["mrays_s"]
            / results["s100_400_base"]["mrays_s"], 3)
    if "s100_400_base" in results and "s800_400_base" in results:
        d["f_scale_100_over_800"] = round(
            results["s100_400_base"]["mrays_s"]
            / results["s800_400_base"]["mrays_s"], 3)
    best1024 = max(
        (v["mrays_s"] for k, v in results.items() if "1024" in k),
        default=None,
    )
    d["best_1024"] = best1024
    d["reference_bar"] = 17.41
    d["note"] = (
        "bar = thesis T6.2 streamingSK 17.41 (400^2, scale 800) held "
        "resolution-neutral; f_res/f_scale decompose how the config-3 "
        "workload differs from that row on our own kernels")
    if best1024 is not None:
        d["vs_reference_bar"] = round(best1024 / 17.41, 3)
    results["derivation"] = d
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(d, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
