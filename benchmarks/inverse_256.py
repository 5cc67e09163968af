#!/usr/bin/env python
"""BASELINE config 5: recover a 256^3 density grid from target renders.

Ground truth: the medical-class CT-statistics volume (procedural
smoothstep field).  The optimization runs the two-level (sparse-leap,
stochastic-tap) differentiable estimator end to end — forward renders
and score-function density gradients through Woodcock tracking — with
Adam, density clipping, and periodic checkpoints (models/inverse.py).

Multi-host: the same step runs sharded via parallel/shard.make_inverse_step
(gradient psum over the 'rays' mesh axis); this driver runs single-chip
and the sharded path is exercised by __graft_entry__.dryrun_multichip
and tests/test_sharding.py (no multi-chip hardware in this environment).

Reports: loss trajectory, relative grid MSE (init -> final), wall time.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=256)
    parser.add_argument("--res", type=int, default=192)
    parser.add_argument("--spp", type=int, default=8)
    parser.add_argument("--steps", type=int, default=60)
    parser.add_argument("--lr", type=float, default=0.05)
    parser.add_argument("--out", default="benchmarks/results_inverse256.json")
    args = parser.parse_args()

    import jax.numpy as jnp

    from cudavolumerenderer_tpu.models.differentiable import (
        CameraSpec,
        SceneSpec,
        render_diff,
    )
    from cudavolumerenderer_tpu.models.inverse import (
        InverseConfig,
        run_inverse,
    )
    from cudavolumerenderer_tpu.scene import procedural
    from cudavolumerenderer_tpu.scene.types import RenderSettings

    n = args.n
    gt = jnp.asarray(procedural.medical_volume((n, n, n), n_blobs=40))
    albedo = jnp.full((1, 1, 1, 4), 0.9, jnp.float32)

    spec = SceneSpec(scale=100.0, max_density=1.0)
    cam = CameraSpec(res_x=args.res, res_y=args.res, fov_x_deg=0.7)
    settings = RenderSettings.from_flags(
        True, russian_roulette=True, max_path_length=200
    )

    # target: high-spp render of the ground truth (fixed seed)
    t0 = time.time()
    target = render_diff(
        gt, albedo, 999, spec, cam, settings, (args.res, args.res),
        args.spp * 4, True,
    ) / float(args.spp * 4)
    target = jnp.asarray(np.asarray(target))  # sync
    print(f"target render: {time.time() - t0:.1f}s", flush=True)

    density0 = jnp.full((n, n, n), 0.25, jnp.float32)
    config = InverseConfig(
        resolution=(args.res, args.res), spp=args.spp,
        learning_rate=args.lr, n_steps=args.steps, seed=17,
        two_level=True, checkpoint_dir="/tmp/inv256_ckpt",
        checkpoint_every=20,
    )

    losses_seen = []

    def progress(step, loss):
        losses_seen.append(loss)
        if step % 5 == 0:
            print(f"  step {step:4d}  loss {loss:.6f}", flush=True)

    t0 = time.time()
    density, _, losses = run_inverse(
        target, density0, albedo, spec, cam, settings, config,
        progress=progress,
    )
    wall = time.time() - t0

    gt_np = np.asarray(gt)
    mse0 = float(((np.asarray(density0) - gt_np) ** 2).mean())
    mse1 = float(((np.asarray(density) - gt_np) ** 2).mean())
    result = {
        "grid": f"{n}^3",
        "views": 1,
        "res": args.res,
        "spp": args.spp,
        "steps": args.steps,
        "wall_s": round(wall, 1),
        "loss_first": round(losses[0], 6),
        "loss_last": round(losses[-1], 6),
        "grid_mse_init": round(mse0, 6),
        "grid_mse_final": round(mse1, 6),
        "grid_mse_ratio": round(mse1 / mse0, 4),
    }
    print(json.dumps(result), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
