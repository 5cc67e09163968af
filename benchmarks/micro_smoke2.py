#!/usr/bin/env python
"""Round-4 smoke-class sweep (VERDICT r3 item 4: 15.0 -> >=17.41).

The smoke class (128x128x50 grid, scale 800 — thesis Table 6.2,
/root/reference/data/mitsubaxml/smoke/hetvol.xml) is the null-collision
stress test: ~scale*max_density*mean_chord Woodcock candidates per
free flight.  Unlike medical, its 3.3 MB density table is ALREADY on
XLA's fast small-table gather path, so the levers are different:
majorant tightness (brick size down to 2^3 via the new brick_size
override), cascade shape, lane packing, and tail treatment.

Medical got three sweep files in round 3; this gives smoke the same
treatment.  Timing discipline per PERF.md: host-readback fences,
fresh seeds per rep, discard rep 0.
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
    parser.add_argument("--out", default="benchmarks/results_smoke2.json")
    parser.add_argument("--only", nargs="*", default=None)
    parser.add_argument("--no-stats", action="store_true")
    args = parser.parse_args()

    import jax.numpy as jnp

    from cudavolumerenderer_tpu.models import fast
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
    common = dict(
        tile_dim=(res, res), tile_offset=jnp.zeros(2, jnp.float32),
        full_resolution=(res, res), spp=args.spp, two_level=True,
    )

    if not args.no_stats:
        out = fast.render_tile(
            scene, camera, settings, seed=1, path_id_base=0,
            with_stats=True, cascade_factor=2, **common,
        )
        _ = float(out[0].sum())  # host fence
        nr, n_rows, n_busy = float(out[1]), float(out[2]), float(out[3])
        stage_rows = [float(x) for x in out[4]]
        widths = fast._cascade_widths(
            res * res, factor=2, min_width=fast._default_min_width(),
        )
        print(f"stats casc2: rays={nr:.0f} rows={n_rows:.0f} "
              f"busy={n_busy / max(n_rows, 1):.3f} "
              f"width_equiv={n_rows / (res * res):.1f}",
              flush=True)
        for w, r in zip(widths, stage_rows):
            print(f"  stage w={int(w):8d}: iters={r / w:7.0f}",
                  flush=True)

    base = dict(cascade_factor=2)
    configs = [
        ("casc2", dict(**base)),                      # round-3 champion
        ("casc4", dict()),
        ("casc2+m2", dict(**base, lanes_per_pixel=2)),
        ("casc2+b2", dict(**base, brick_size=(2, 2, 2))),
        ("casc2+b224", dict(**base, brick_size=(2, 2, 4))),
        ("casc2+b2+m2", dict(**base, brick_size=(2, 2, 2),
                             lanes_per_pixel=2)),
        ("casc2+b8", dict(**base, brick_size=(8, 8, 8))),
        ("casc2+tb2", dict(**base, tail_bricks=2)),
        ("casc2+chain16", dict(**base, tail_chain=16)),
        ("casc2+minw512", dict(**base, min_width=512)),
        ("casc3", dict(cascade_factor=3)),
        ("casc2+b2+tb2", dict(**base, brick_size=(2, 2, 2),
                              tail_bricks=2)),
        # round-4 packed tables: smoke's 3.3 MB table packs to 0.4 MB
        # (4-bit) — into the fast <=1 MB gather class (micro_pgather)
        ("casc2+q4", dict(**base, table_bits=4)),
        ("casc2+q8", dict(**base, table_bits=8)),
        ("casc2+b2+q4", dict(**base, brick_size=(2, 2, 2),
                             table_bits=4)),
        ("casc2+q4+minw64", dict(**base, table_bits=4, min_width=64)),
        # round-5: the fractional factor that won medical (f1.25) and
        # bucky (+8%)
        ("f125+q4+minw64", dict(cascade_factor=1.25, table_bits=4,
                                min_width=64)),
        ("f15+q4+minw64", dict(cascade_factor=1.5, table_bits=4,
                               min_width=64)),
    ]
    if args.only:
        configs = [
            (n, kw) for n, kw in configs
            if any(s in n for s in args.only)
        ]

    from cudavolumerenderer_tpu.config import Config

    results = {}
    for name, kw in configs:
        # production quantization gate (CLI-reachable via
        # `--table-bits N --allow-quantized`); quantized rows are
        # labeled reduced-precision in the JSON
        kw = dict(kw)
        kw["table_bits"] = Config(
            table_bits=kw.get("table_bits", 32),
            allow_quantized=True, settings=settings,
        ).effective_table_bits
        times, rays = [], 0.0
        seed = 900
        for rep in range(args.reps + 1):
            seed += 1
            t0 = time.time()
            img, nr = fast.render_tile(
                scene, camera, settings, seed=seed, path_id_base=0,
                **common, **kw,
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
            "s": best, "mrays_s": rays / best / 1e6,
            "precision": (
                f"reduced-q{kw['table_bits']}"
                if kw["table_bits"] < 32 else "full-f32"
            ),
        }
        print(f"{name}: BEST {rays / best / 1e6:.2f} Mrays/s", flush=True)

    with open(args.out, "w") as f:
        json.dump({"res": res, "spp": args.spp,
                   "reference_best": 17.41, "results": results}, f,
                  indent=1)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    sys.exit(main())
