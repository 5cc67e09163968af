#!/usr/bin/env python
"""Micro: can the MXU beat XLA's HBM gather for brick-table lookups?

Compares three ways to fetch one density value per lane when lanes are
grouped in rows of 128 sharing a 256-entry brick table:

  a) big-gather   : jnp.take from the flat (V,) HBM table (status quo,
                    ~88 M rows/s measured round 1);
  b) row-gather   : gather each row's 256-entry table from a (B, 256)
                    array (R rows only), then take_along_axis twice
                    (128-wide chunks) — the XLA version of the Pallas
                    dynamic_gather layout;
  c) onehot-mxu   : same per-row tables, lookup as a batched one-hot
                    matmul einsum('rlk,rk->rl') — turns the gather into
                    MXU work.

Also measures coherence sensitivity of (a): random vs Morton-clustered
indices.  Chained so results cannot be reused (PERF.md pitfall).
"""

import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    n_lanes = 1 << 17
    n_rows = n_lanes // 128
    n_vox = 1 << 24  # 16M = 256^3
    n_bricks = 1 << 16
    steps = 64
    rng = np.random.RandomState(0)

    table = jnp.asarray(rng.rand(n_vox).astype(np.float32))
    btabs = jnp.asarray(rng.rand(n_bricks, 256).astype(np.float32))

    def bench(fn, *args, label=""):
        _ = float(fn(*args).sum())
        times = []
        for _rep in range(3):
            t0 = time.perf_counter()
            _ = float(fn(*args).sum())
            times.append(time.perf_counter() - t0)
        best = min(times)
        rate = n_lanes * steps / best / 1e6
        print(f"{label:28s} {[round(t*1e3,1) for t in times]} ms"
              f" -> {rate:7.1f} M lookups/s", flush=True)
        return rate

    @jax.jit
    def big_gather(idx0):
        def body(i, carry):
            acc, idx = carry
            v = jnp.take(table, idx, axis=0)
            acc = acc + v
            idx = (idx * 1664525 + 1013904223 + acc.astype(jnp.int32)) % n_vox
            return acc, jnp.abs(idx)
        acc, _ = jax.lax.fori_loop(
            0, steps, body, (jnp.zeros((n_lanes,), jnp.float32), idx0)
        )
        return acc

    @jax.jit
    def big_gather_coherent(idx0):
        # indices clustered: lane i reads near base + small offset
        base = (jnp.arange(n_lanes, dtype=jnp.int32) // 128) * 128
        def body(i, carry):
            acc, idx = carry
            j = base + (idx % 512)  # 512-entry window per row
            v = jnp.take(table, jnp.clip(j, 0, n_vox - 1), axis=0)
            acc = acc + v
            idx = jnp.abs(idx * 1664525 + 1013904223
                          + acc.astype(jnp.int32))
            return acc, idx
        acc, _ = jax.lax.fori_loop(
            0, steps, body, (jnp.zeros((n_lanes,), jnp.float32), idx0)
        )
        return acc

    @jax.jit
    def row_gather(brick0, idx0):
        def body(i, carry):
            acc, brick, idx = carry
            rows = jnp.take(btabs, brick, axis=0)  # (R, 256)
            lo = rows[:, :128]
            hi = rows[:, 128:]
            idx2 = idx.reshape(n_rows, 128)
            is_hi = idx2 >= 128
            j = jnp.where(is_hi, idx2 - 128, idx2)
            v = jnp.where(
                is_hi,
                jnp.take_along_axis(hi, j, axis=1),
                jnp.take_along_axis(lo, j, axis=1),
            ).reshape(-1)
            acc = acc + v
            idx = jnp.abs(idx * 1664525 + 1013904223
                          + acc.astype(jnp.int32)) % 256
            brick = jnp.abs(brick * 22695477 + 1) % n_bricks
            return acc, brick, idx
        acc, _, _ = jax.lax.fori_loop(
            0, steps, body,
            (jnp.zeros((n_lanes,), jnp.float32), brick0, idx0),
        )
        return acc

    @jax.jit
    def onehot_mxu(brick0, idx0):
        def body(i, carry):
            acc, brick, idx = carry
            rows = jnp.take(btabs, brick, axis=0)  # (R, 256)
            idx2 = idx.reshape(n_rows, 128)
            onehot = (
                idx2[:, :, None]
                == jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)
            ).astype(jnp.float32)
            v = jnp.einsum(
                "rlk,rk->rl", onehot, rows,
                preferred_element_type=jnp.float32,
            ).reshape(-1)
            acc = acc + v
            idx = jnp.abs(idx * 1664525 + 1013904223
                          + acc.astype(jnp.int32)) % 256
            brick = jnp.abs(brick * 22695477 + 1) % n_bricks
            return acc, brick, idx
        acc, _, _ = jax.lax.fori_loop(
            0, steps, body,
            (jnp.zeros((n_lanes,), jnp.float32), brick0, idx0),
        )
        return acc

    def make_onehot_k(k_entries, n_b, dtype=jnp.float32):
        """onehot-mxu over per-row tables of k_entries (super-brick tap
        tables: 4096 = 16^3, 32768 = 32^3).  The (B, K) table is the
        whole 16M-voxel grid re-laid-out super-brick-major, so total HBM
        stays 64 MB; per-iteration traffic is n_rows * K * 4 bytes."""
        btabs_k = jnp.asarray(
            rng.rand(n_b, k_entries).astype(np.float32), dtype
        )

        @jax.jit
        def fn(brick0, idx0):
            def body(i, carry):
                acc, brick, idx = carry
                rows = jnp.take(btabs_k, brick, axis=0)  # (R, K)
                idx2 = idx.reshape(n_rows, 128)
                onehot = (
                    idx2[:, :, None]
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (1, 1, k_entries), 2
                    )
                ).astype(dtype)
                v = jnp.einsum(
                    "rlk,rk->rl", onehot, rows,
                    preferred_element_type=jnp.float32,
                ).reshape(-1)
                acc = acc + v
                idx = jnp.abs(idx * 1664525 + 1013904223
                              + acc.astype(jnp.int32)) % k_entries
                brick = jnp.abs(brick * 22695477 + 1) % n_b
                return acc, brick, idx
            acc, _, _ = jax.lax.fori_loop(
                0, steps, body,
                (jnp.zeros((n_lanes,), jnp.float32), brick0, idx0),
            )
            return acc

        return fn

    idx_v = jnp.asarray(rng.randint(0, n_vox, n_lanes), jnp.int32)
    idx_s = jnp.asarray(rng.randint(0, 256, n_lanes), jnp.int32)
    brick0 = jnp.asarray(
        np.repeat(rng.randint(0, n_bricks, n_rows), 1), jnp.int32
    )
    bench(big_gather, idx_v, label="a) big-gather random")
    bench(big_gather_coherent, idx_v, label="a') big-gather clustered")
    bench(row_gather, brick0, idx_s, label="b) row-gather 2x128")
    bench(onehot_mxu, brick0, idx_s, label="c) onehot-mxu 256")
    for k_e, n_b, tag in (
        (4096, 4096, "d) onehot-mxu 4096"),
        (32768, 512, "e) onehot-mxu 32768"),
    ):
        fn = make_onehot_k(k_e, n_b)
        b0 = jnp.asarray(rng.randint(0, n_b, n_rows), jnp.int32)
        i0 = jnp.asarray(rng.randint(0, k_e, n_lanes), jnp.int32)
        bench(fn, b0, i0, label=tag)
    fnb = make_onehot_k(32768, 512, jnp.bfloat16)
    b0 = jnp.asarray(rng.randint(0, 512, n_rows), jnp.int32)
    i0 = jnp.asarray(rng.randint(0, 32768, n_lanes), jnp.int32)
    bench(fnb, b0, i0, label="f) onehot-mxu 32768 bf16")

    def make_twostage(k_entries, n_b):
        """Two-stage lookup: k = k_hi*128 + k_lo.  Stage 1 selects the
        128-wide sub-row with an MXU matmul over k_hi (no giant one-hot
        to fuse); stage 2 is a VPU row-dot over k_lo.  Intermediate is
        (R, 128, 128) — 134 MB at R=2048, always materializable."""
        k_hi = k_entries // 128
        btabs_k = jnp.asarray(
            rng.rand(n_b, k_hi, 128).astype(np.float32)
        )

        @jax.jit
        def fn(brick0, idx0):
            def body(i, carry):
                acc, brick, idx = carry
                rows = jnp.take(btabs_k, brick, axis=0)  # (R, KH, 128)
                idx2 = idx.reshape(n_rows, 128)
                hi = idx2 >> 7
                lo = idx2 & 127
                oh_hi = (
                    hi[:, :, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (1, 1, k_hi), 2)
                ).astype(jnp.float32)
                sub = jnp.einsum(
                    "rlh,rhk->rlk", oh_hi, rows,
                    preferred_element_type=jnp.float32,
                )  # (R, 128, 128)
                oh_lo = (
                    lo[:, :, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
                ).astype(jnp.float32)
                v = jnp.sum(sub * oh_lo, axis=-1).reshape(-1)
                acc = acc + v
                idx = jnp.abs(idx * 1664525 + 1013904223
                              + acc.astype(jnp.int32)) % k_entries
                brick = jnp.abs(brick * 22695477 + 1) % n_b
                return acc, brick, idx
            acc, _, _ = jax.lax.fori_loop(
                0, steps, body,
                (jnp.zeros((n_lanes,), jnp.float32), brick0, idx0),
            )
            return acc

        return fn

    fn2 = make_twostage(32768, 512)
    bench(fn2, b0, i0, label="g) two-stage-mxu 32768")
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    sys.exit(main())
