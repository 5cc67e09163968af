#!/usr/bin/env python
"""Microbenchmark: XLA gather-row throughput vs table size on TPU.

Hypothesis (PERF.md round-1): the medical-class collapse (1.9 Mrays/s)
comes from gather rows slowing down as the fused table grows past the
last-level cache-ish behavior of HBM random access.  Measures rows/s for
1-wide and 5-wide rows over tables from 32^3 to 256^3 voxels, plus
random vs spatially-clustered indices (coherence sensitivity).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, table, idx_maker, reps=5):
    """Fresh index array per rep — the tunnel reuses results for
    identical repeat executions (PERF.md pitfall)."""
    _ = float(fn(table, idx_maker(0)).sum())
    times = []
    for r in range(1, reps + 1):
        idx = idx_maker(r)
        jax.block_until_ready(idx)
        t0 = time.perf_counter()
        # host readback: block_until_ready is not a reliable fence
        # through the axon tunnel (returns before execution completes)
        _ = float(fn(table, idx).sum())
        times.append(time.perf_counter() - t0)
    return times


def main():
    n_lanes = 1 << 20
    steps = 512  # chained gathers per call, defeats result reuse

    @jax.jit
    def chain_gather(table, idx0):
        n_rows = table.shape[0]

        def body(i, carry):
            acc, idx = carry
            row = jnp.take(table, idx, axis=0)
            acc = acc + row.sum(-1) if row.ndim > 1 else acc + row
            # index depends on the fetch → serial chain
            nxt = (idx * 1664525 + 1013904223 + acc.astype(jnp.int32)) % n_rows
            return acc, jnp.abs(nxt)

        acc, _ = jax.lax.fori_loop(
            0, steps, body, (jnp.zeros((n_lanes,), jnp.float32), idx0)
        )
        return acc

    rng = np.random.RandomState(0)
    for label, n_vox in [
        ("16k", 1 << 14),
        ("64k", 1 << 16),
        ("256k", 1 << 18),
        ("1M", 1 << 20),
        ("2M", 1 << 21),
        ("4M", 1 << 22),
        ("16M", 1 << 24),
    ]:
        for width in (1, 2, 4):
            shape = (n_vox, width)
            table = jnp.asarray(rs_table(rng, shape))
            idx_maker = lambda r: jnp.asarray(
                rng.randint(0, n_vox, size=n_lanes), jnp.int32
            )
            ts = bench(chain_gather, table, idx_maker)
            best = min(ts)
            rate = n_lanes * steps / best / 1e6
            print(
                f"{label:12s} w={width}  {[round(t*1e3,1) for t in ts]} ms"
                f"  -> {rate:7.1f} M rows/s",
                flush=True,
            )


def rs_table(rng, shape):
    return rng.rand(*shape).astype(np.float32)


if __name__ == "__main__":
    main()
