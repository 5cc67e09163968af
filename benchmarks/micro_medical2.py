#!/usr/bin/env python
"""Round-2 medical-class experiments (VERDICT r1 item 2).

Sweeps the two-level brick size (probe-table size vs majorant
tightness) and lanes_per_pixel on the 256^3 medical-class scene.
Tighter bricks cut candidate Woodcock steps (each step = one big-table
gather, the measured bottleneck at ~88 M rows/s) at the cost of a
bigger (B, 2) probe table that may fall off the ~367 M rows/s
small-table gather path.

Timing discipline per PERF.md: host-readback fences, discard rep 0.
"""

import argparse
import json
import time

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--res", type=int, default=512)
    parser.add_argument("--spp", type=int, default=4)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--out", default="benchmarks/results_medical2.json")
    parser.add_argument(
        "--only", nargs="*", default=None,
        help="run only sweep configs whose name contains any of these "
        "substrings (lets tunnel-risky Pallas compiles run in their own "
        "timeout-guarded process)")
    parser.add_argument(
        "--no-stats", action="store_true",
        help="skip the with_stats diagnostic render")
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

    d = procedural.medical_volume((256, 256, 256), n_blobs=40)
    alb = np.stack([d, 0.5 * np.ones_like(d), 1.0 - d], axis=-1)
    scene = make_scene(make_medium(d, alb, scale=100.0, max_density=1.0))
    res = args.res
    camera = make_camera(res, res)
    settings = RenderSettings.from_flags(True)

    # busy-fraction + per-stage diagnostic (one run with stats) at the
    # CHAMPION config (b8+minw64+q4) — the receipts for the round-5
    # ceiling analysis
    stats_kw = dict(max_bricks=512, min_width=64, table_bits=4,
                    cascade_factor=2)
    out = None if args.no_stats else fast.render_tile(
        scene, camera, settings, (res, res), jnp.zeros(2, jnp.float32),
        (res, res), args.spp, 1, 0, two_level=True, with_stats=True,
        **stats_kw,
    )
    if out is not None:
        n_rays, n_rows, n_busy = (
            float(out[1]), float(out[2]), float(out[3])
        )
        stage_rows = np.asarray(out[4])
        widths = fast._cascade_widths(res * res, 2, 64)
        print(
            f"stats(casc=2): rays={n_rays:.0f} rows={n_rows:.0f} "
            f"busy_frac={n_busy / max(n_rows, 1):.3f} "
            f"width_equiv_iters={n_rows / (res * res):.0f}",
            flush=True,
        )
        for w, r in zip(widths, stage_rows):
            print(
                f"  stage width={w:7d}: rows={r:12.0f} "
                f"iters={r / w:7.0f} width_equiv={r / (res * res):6.1f}",
                flush=True,
            )

    results = {}
    # spec/single-level confined to the 4096-wide tail pool (spec_width):
    # the earlier sweep applied spec-8 at 16384-lane pools where the
    # (N, 8) gather is 131k rows — far off the latency floor — and lost
    base = dict(cascade_factor=2)
    # round 3 of the sweep: bricks16 won the last round (8.19 vs 7.48 —
    # fewer crossing rows at full width); now attack the 1416-iteration
    # 4096-lane tail with per-stage brick tables (tail_bricks): tight
    # majorants cut the deep path's null collisions where iterations,
    # not rows, are the cost
    sweep = [
        ("bricks16", dict(**base, max_bricks=4096)),
        ("bricks16+tb4", dict(**base, max_bricks=4096, tail_bricks=4)),
        # round-3 sweep (VERDICT r2 items 2+9): finish the spec_width /
        # tail knob sweep and measure the Pallas tail kernel.
        # (a) speculative single-level tail confined to narrow pools:
        # a (512, K) gather is still ~1 latency-floor row fetch, and
        # with a global majorant every speculative step stays valid
        ("b16+spec8@512",
         dict(**base, max_bricks=4096, min_width=512,
              tail_single_level=True, tail_spec=8, spec_width=512)),
        ("b16+spec16@512",
         dict(**base, max_bricks=4096, min_width=512,
              tail_single_level=True, tail_spec=16, spec_width=512)),
        ("b16+spec32@512",
         dict(**base, max_bricks=4096, min_width=512,
              tail_single_level=True, tail_spec=32, spec_width=512)),
        ("b16+spec16@2048",
         dict(**base, max_bricks=4096, min_width=2048,
              tail_single_level=True, tail_spec=16, spec_width=2048)),
        # (b) deeper cascade alone (does shrinking the pool pay at all?)
        ("b16+minw512", dict(**base, max_bricks=4096, min_width=512)),
        # (c) the persistent Pallas tail kernel (ops/pallas/tailpk.py)
        ("b16+tailpk128",
         dict(**base, max_bricks=4096, tail_pallas=True,
              tail_pk_width=128, tail_pk_steps=16)),
        ("b16+tailpk256",
         dict(**base, max_bricks=4096, tail_pallas=True,
              tail_pk_width=256, tail_pk_steps=16)),
        ("b16+tailpk128s32",
         dict(**base, max_bricks=4096, tail_pallas=True,
              tail_pk_width=128, tail_pk_steps=32)),
        # (d) hand off to the kernel EARLIER: the 4096-lane XLA pool
        # drains at the latency floor until pending fits pk_width, so a
        # wider kernel pool (VMEM-bound at ~512 rows = 10 MB of windows)
        # or a narrower last XLA pool (min_width) shifts more of the
        # drain curve into VMEM
        ("b16+tailpk512",
         dict(**base, max_bricks=4096, tail_pallas=True,
              tail_pk_width=512, tail_pk_steps=16)),
        ("b16+minw512+tailpk256",
         dict(**base, max_bricks=4096, min_width=512,
              tail_pallas=True, tail_pk_width=256, tail_pk_steps=16)),
        # (e) round-3 part 2: minw512 won decisively (9.20 vs 8.13) and
        # spec/tailpk variants all lost — the chained XLA tail pools
        # amortize the latency floor better than speculation or the
        # Pallas service loop.  How deep does the cascade pay?
        ("b16+minw256", dict(**base, max_bricks=4096, min_width=256)),
        ("b16+minw128", dict(**base, max_bricks=4096, min_width=128)),
        ("b16+minw64", dict(**base, max_bricks=4096, min_width=64)),
        # (f) the minw128 anatomy shows 83% of rows in the 61 full-width
        # iterations (busy 0.518): attack candidate-step count with a
        # tighter majorant grid (32^3 bricks of 8^3 voxels; probe table
        # (32768, 2) stays on the fast small-gather path)
        ("b32+minw128", dict(**base, max_bricks=32768, min_width=128)),
        ("b8+minw128", dict(**base, max_bricks=512, min_width=128)),
        # round-4: quantized packed density tables (rate-class jump)
        ("b8+minw128+tb4",
         dict(**base, max_bricks=512, min_width=128, table_bits=4)),
        ("b8+minw128+tb8",
         dict(**base, max_bricks=512, min_width=128, table_bits=8)),
        ("b16+minw128+tb4",
         dict(**base, max_bricks=4096, min_width=128, table_bits=4)),
        # round-4b: q4 interaction sweep
        ("b32+minw128+q4",
         dict(**base, max_bricks=32768, min_width=128, table_bits=4)),
        ("b8+minw128+q4+m2",
         dict(**base, max_bricks=512, min_width=128, table_bits=4,
              lanes_per_pixel=2)),
        ("b8+minw128+q4+casc3",
         dict(cascade_factor=3, max_bricks=512, min_width=128,
              table_bits=4)),
        ("b8+minw64+q4",
         dict(**base, max_bricks=512, min_width=64, table_bits=4)),
        ("b32+minw64+qq4",
         dict(**base, max_bricks=32768, min_width=64, table_bits=4)),
        ("b8+minw32+qq4",
         dict(**base, max_bricks=512, min_width=32, table_bits=4)),
        ("b32+minw32+qq4",
         dict(**base, max_bricks=32768, min_width=32, table_bits=4)),
        ("b128k+minw64+qq4",
         dict(**base, max_bricks=131072, min_width=64, table_bits=4)),
        # round-5: fractional cascade factors — the full-width stage is
        # 83% of rows at busy ~0.52 (r3 anatomy); finer shrink steps
        # near full width compact idle lanes out earlier.  Cost: one
        # extra ~(N,31)-pack argsort compaction per extra stage
        # (~3-9 ms at 262k lanes) vs saved idle full-width rows.
        ("b8+minw64+q4+f15",
         dict(cascade_factor=1.5, max_bricks=512, min_width=64,
              table_bits=4)),
        ("b8+minw64+q4+f133",
         dict(cascade_factor=1.33, max_bricks=512, min_width=64,
              table_bits=4)),
        ("b8+minw64+q4+f125",
         dict(cascade_factor=1.25, max_bricks=512, min_width=64,
              table_bits=4)),
        ("b8+minw64+f15",
         dict(cascade_factor=1.5, max_bricks=512, min_width=64)),
        # f125 measured 11.84 (> f15 11.68 > casc2 11.58): push finer
        ("b8+minw64+q4+f120",
         dict(cascade_factor=1.2, max_bricks=512, min_width=64,
              table_bits=4)),
        ("b8+minw64+q4+f115",
         dict(cascade_factor=1.15, max_bricks=512, min_width=64,
              table_bits=4)),
        ("b8+minw64+q4+f110",
         dict(cascade_factor=1.1, max_bricks=512, min_width=64,
              table_bits=4)),
        # round-5b: brick x factor interaction after the 1024^3
        # transit-row finding (coarser may pay at f125 too)
        ("b4+minw64+q4+f125",
         dict(cascade_factor=1.25, max_bricks=64, min_width=64,
              table_bits=4)),
        ("b16+minw64+q4+f125",
         dict(cascade_factor=1.25, max_bricks=4096, min_width=64,
              table_bits=4)),
    ]
    if args.only:
        sweep = [
            (k, kw) for k, kw in sweep
            if any(sub in k for sub in args.only)
        ]
        print(f"--only: {[k for k, _ in sweep]}", flush=True)
    from cudavolumerenderer_tpu.config import Config

    for key, kw in sweep:
        # quantized configs go through the SAME gate as production
        # (Config.effective_table_bits with the explicit opt-in), so
        # every benched config is CLI-reachable via
        # `--table-bits N --allow-quantized`; results are labeled
        # reduced-precision below
        kw = dict(kw)
        kw["table_bits"] = Config(
            table_bits=kw.get("table_bits", 32),
            allow_quantized=True, settings=settings,
        ).effective_table_bits
        times, rays = [], 0.0
        for rep in range(args.reps + 1):
            seed = 100 + rep
            t0 = time.perf_counter()
            img, nr = fast.render_tile(
                scene, camera, settings, (res, res),
                jnp.zeros(2, jnp.float32), (res, res), args.spp,
                seed, 0, two_level=True, **kw,
            )
            rays = float(nr)  # host readback = fence
            _ = float(img.sum())
            dt = time.perf_counter() - t0
            if rep > 0:  # discard compile/warmup rep
                times.append(dt)
        best = min(times)
        mrays = rays / best / 1e6
        results[key] = {
            "times_s": [round(t, 3) for t in times],
            "mrays_per_s": round(mrays, 2),
            "precision": (
                f"reduced-q{kw['table_bits']}"
                if kw["table_bits"] < 32 else "full-f32"
            ),
        }
        print(f"{key:28s} {[round(t,3) for t in times]}"
              f" -> {mrays:6.2f} Mrays/s", flush=True)
        # flush incrementally: compiles through the tunnel can take
        # tens of minutes and the process may be cut at round end
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    sys.exit(main())
