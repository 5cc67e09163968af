#!/usr/bin/env python
"""Micro: cost of a rebin (argsort by brick key + packed state permute)
at fastSK pool widths.  This is the amortized overhead of the MXU-tap
binned super-round (lanes sorted so MXU rows share a super-brick
table); it decides the rebin cadence.
"""

import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    n_fields = 20
    for n_lanes in (1 << 16, 1 << 18, 1 << 20):
        rng = np.random.RandomState(0)
        keys0 = jnp.asarray(rng.randint(0, 2048, n_lanes), jnp.int32)
        state = jnp.asarray(
            rng.rand(n_lanes, n_fields).astype(np.float32)
        )

        @jax.jit
        def rebin(keys, st):
            def body(i, carry):
                k, s = carry
                order = jnp.argsort(k)
                s = jnp.take(s, order, axis=0)
                k = jnp.take(k, order, axis=0)
                # perturb so iterations can't be folded
                k = (k + s[:, 0].astype(jnp.int32) + i) % 2048
                return k, s

            return jax.lax.fori_loop(0, 8, body, (keys, st))

        _ = jax.block_until_ready(rebin(keys0, state))
        times = []
        for _rep in range(3):
            t0 = time.perf_counter()
            out = rebin(keys0, state)
            _ = float(out[1].sum())
            times.append((time.perf_counter() - t0) / 8)
        print(
            f"{n_lanes:8d} lanes x {n_fields} fields:"
            f" {min(times)*1e3:6.2f} ms per rebin",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    sys.exit(main())
