#!/usr/bin/env python
"""Micro: does index locality matter for XLA gathers from GIANT tables?

At 67 MB (benchmarks/micro_onehot.py row a') clustered indices were
measured *slower* than random — the v5e gather unit is latency-bound and
indifferent to coherence at that size.  The 1024^3 class gathers from a
4.3 GB table, where page-table pressure could change the story (the
brick-major layout, models/fast.brick_major_table, is only worth keeping
if it does).  This sweeps table sizes at fixed lane count.
"""

import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    n_lanes = 1 << 17
    steps = 32

    def bench(fn, *args, label=""):
        _ = float(fn(*args).sum())
        times = []
        for _rep in range(3):
            t0 = time.perf_counter()
            _ = float(fn(*args).sum())
            times.append(time.perf_counter() - t0)
        best = min(times)
        rate = n_lanes * steps / best / 1e6
        print(f"{label:34s} {[round(t*1e3,1) for t in times]} ms"
              f" -> {rate:7.1f} M lookups/s", flush=True)

    for log2v in (24, 27, 29, 30):
        n_vox = 1 << log2v

        @jax.jit
        def build(n_vox=n_vox):
            i = jnp.arange(n_vox, dtype=jnp.uint32)
            h = i * jnp.uint32(0x9E3779B9)
            h = h ^ (h >> 16)
            return (h >> 8).astype(jnp.float32) * (1.0 / (1 << 24))

        table = build()

        def gather(idx0, window, table=table, n_vox=n_vox):
            base = (jnp.arange(n_lanes, dtype=jnp.int32) // 128) * (
                n_vox // (n_lanes // 128)
            )

            def body(i, carry):
                acc, idx = carry
                if window:
                    j = base + (idx % window)
                else:
                    j = idx % n_vox
                v = jnp.take(table, jnp.clip(j, 0, n_vox - 1), axis=0)
                acc = acc + v
                idx = jnp.abs(
                    idx * 1664525 + 1013904223 + acc.astype(jnp.int32)
                )
                return acc, idx

            acc, _ = jax.lax.fori_loop(
                0, steps, body,
                (jnp.zeros((n_lanes,), jnp.float32), idx0),
            )
            return acc

        rnd = jax.jit(lambda i, g=gather: g(i, 0))
        clu = jax.jit(lambda i, g=gather: g(i, 2048))
        rng = np.random.RandomState(0)
        idx0 = jnp.asarray(rng.randint(0, n_vox, n_lanes), jnp.int32)
        gb = n_vox * 4 / 2**30
        bench(rnd, idx0, label=f"{gb:5.2f} GB random")
        bench(clu, idx0, label=f"{gb:5.2f} GB clustered(2048/row)")
        del table
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    sys.exit(main())
