"""Microbench: can anything beat XLA's big-table gather?

Round-3 anatomy (PERF.md): the medical class spends ~180 ms of a 320 ms
render in 61 full-width iterations, each paying one 262144-row gather
into the 67 MB flat density table at ~88 M rows/s — ~0.35 GB/s of
effective bandwidth against a v5e's ~800 GB/s HBM.  The 1024^3 class
pays the same wall at ~40 M rows/s into a 4.3 GB table.  This bench
establishes the ceiling for every candidate replacement BEFORE a full
tracking kernel is built around one (round-4 VERDICT task 1).

Variants (select with --only; each is safe to run alone in its own
process so a Mosaic compile crash cannot take the whole suite down):

  xla_big        jnp.take from the full table — THE WALL (baseline)
  xla_sorted     same with pre-sorted indices (locality probe; round-2
                 measured clustered indices gather SLOWER, 36.9 vs 56)
  xla_slice      sequential per-shard dynamic_slice + take on perfectly
                 pre-binned indices (does a fresh 4 MB sub-table ride
                 XLA's small-table fast path?)
  xla_batched    one batched gather, operand batch dims (S, C)x(S, K)
  bin_argsort    cost of jnp.argsort(shard_id) at N (binning lever 1)
  bin_scatter    cost of cumsum-rank + permutation scatter (lever 2)
  bin_cumsum     cost of one-hot cumsum rank alone (no reorder)
  perm_gather    cost of one (N,)->(N,) permutation gather (the
                 unavoidable unpermute in any sort-based design)
  pallas_vmem    in-kernel jnp.take, table fully VMEM-resident (the
                 central unknown: Mosaic's VMEM gather rate)
  pallas_stream  grid over S shards, every lane masked-taken per shard
                 (no binning, exact, worst-case S*N lane-gathers)
  pallas_binned  grid over S shards, perfectly pre-binned indices,
                 Pallas pipelines the shard DMA (the real design's
                 steady-state economics)

Protocol: fresh random indices per rep (tunnel result-reuse pitfall),
host-readback fence (block_until_ready is not reliable through the axon
tunnel), rep 0 discarded, per-rep prints.

Reference for the wall being attacked:
/root/reference/implementation/src/RegenerationVolPTsk_kernel.cuh:147-232
(the CUDA texture-unit gather this table replaces).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names")
    ap.add_argument("--table-mb", type=float, default=67.0,
                    help="table size in MB (67=medical, 4300=1024^3)")
    ap.add_argument("--n", type=int, default=262144, help="gather rows")
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU correctness)")
    ap.add_argument("--json-out", default=None)
    return ap.parse_args()


def main():
    args = parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    V = int(args.table_mb * (1 << 20) // 4)
    V -= V % (128 * args.shards)  # shard- and lane-aligned
    N = args.n
    S = args.shards
    C = V // S  # entries per shard
    K = N // S  # rows per shard when perfectly binned
    rng = np.random.default_rng(0)
    print(f"table {V} rows ({V*4/2**20:.0f} MB) N={N} S={S} "
          f"shard {C*4/2**20:.1f} MB platform={jax.default_backend()}")

    table = jnp.asarray(rng.random(V, dtype=np.float32))

    def fresh_idx(rep, n=N, lim=V):
        return jnp.asarray(
            np.random.default_rng(rep + 1).integers(0, lim, n)
            .astype(np.int32))

    def fresh_binned(rep):
        """(S, K) indices, row s uniform within shard s (perfect bins)."""
        loc = np.random.default_rng(rep + 1).integers(
            0, C, (S, K)).astype(np.int32)
        return jnp.asarray(loc + (np.arange(S, dtype=np.int32) * C)[:, None])

    results = {}

    def bench(name, make_inputs, fn, check_against=None):
        fn = jax.jit(fn)
        times = []
        chk = None
        for rep in range(args.reps):
            inp = make_inputs(rep)
            # fence input materialization out of the timed region
            for x in inp:
                jax.block_until_ready(x)
            t0 = time.time()
            out = fn(*inp)
            s = float(jnp.asarray(out).ravel()[:8].sum())  # host fence
            dt = time.time() - t0
            times.append(dt)
            print(f"  {name} rep{rep}: {dt*1e3:8.3f} ms  (chk {s:.3f})")
            chk = out
        best = min(times[1:]) if len(times) > 1 else times[0]
        rate = N / best / 1e6
        print(f"{name}: best {best*1e3:.3f} ms = {rate:.1f} M rows/s")
        results[name] = {"ms": best * 1e3, "mrows_s": rate}
        if check_against is not None:
            ref, inp_fn = check_against
            got = np.asarray(fn(*inp_fn(args.reps - 1))).ravel()
            want = np.asarray(ref(*inp_fn(args.reps - 1))).ravel()
            ok = np.array_equal(np.sort(got), np.sort(want))
            print(f"  correctness ({'multiset' if ok else 'FAIL'})")
        return chk

    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    # -- XLA baselines -----------------------------------------------------
    if want("xla_big"):
        bench("xla_big", lambda r: (table, fresh_idx(r)),
              lambda t, i: jnp.take(t, i))
    if want("xla_sorted"):
        bench("xla_sorted",
              lambda r: (table, jnp.sort(fresh_idx(r))),
              lambda t, i: jnp.take(t, i))
    if want("xla_slice"):
        def slice_take(t, ib):  # ib (S, K) globally-indexed, binned
            def one(args_):
                s, loc = args_
                sh = jax.lax.dynamic_slice(t, (s * C,), (C,))
                return jnp.take(sh, loc - s * C)
            return jax.lax.map(one, (jnp.arange(S, dtype=jnp.int32), ib))
        bench("xla_slice", lambda r: (table, fresh_binned(r)), slice_take)
    if want("xla_batched"):
        t3 = table.reshape(S, C)
        def batched(t, ib):
            return jax.vmap(lambda tt, ii: jnp.take(tt, ii))(t, ib % C)
        bench("xla_batched", lambda r: (t3, fresh_binned(r)), batched)

    # -- binning / permutation costs ---------------------------------------
    shift = int(np.log2(C))
    if want("bin_argsort"):
        bench("bin_argsort", lambda r: (fresh_idx(r),),
              lambda i: jnp.take(i, jnp.argsort(i >> shift)))
    if want("bin_scatter"):
        def csort(i):
            sid = (i >> shift).astype(jnp.int32)
            oh = (sid[:, None] == jnp.arange(S, dtype=jnp.int32)[None, :])
            within = jnp.cumsum(oh.astype(jnp.int32), axis=0) - 1
            counts = within[-1] + 1
            base = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
            rank = jnp.take_along_axis(
                within, sid[:, None], axis=1)[:, 0]
            pos = jnp.take(base, sid) + rank
            return jnp.zeros(N, jnp.int32).at[pos].set(i, mode="drop",
                                                       unique_indices=True)
        bench("bin_scatter", lambda r: (fresh_idx(r),), csort)
    if want("bin_cumsum"):
        def crank(i):
            sid = (i >> shift).astype(jnp.int32)
            oh = (sid[:, None] == jnp.arange(S, dtype=jnp.int32)[None, :])
            within = jnp.cumsum(oh.astype(jnp.int32), axis=0) - 1
            return jnp.take_along_axis(within, sid[:, None], axis=1)[:, 0]
        bench("bin_cumsum", lambda r: (fresh_idx(r),), crank)
    if want("perm_gather"):
        bench("perm_gather",
              lambda r: (fresh_idx(r, N, N), fresh_idx(r + 100, N, N)),
              lambda v, p: jnp.take(v, p))

    # -- Pallas ------------------------------------------------------------
    needs_pallas = any(want(x) for x in
                       ("pallas_vmem", "pallas_stream", "pallas_binned"))
    if needs_pallas:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

    if want("pallas_vmem"):
        # table must fit VMEM alongside idx/out: cap at 8 MB
        Vv = min(V, (8 << 20) // 4)
        tabv = table[:Vv]
        def kern(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)
        def vmem_take(t, i):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((N // 128, 128),
                                               jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=args.interpret,
            )(t, i.reshape(N // 128, 128))
        out = bench("pallas_vmem",
                    lambda r: (tabv, fresh_idx(r, N, Vv)), vmem_take)
        ref = np.take(np.asarray(tabv),
                      np.asarray(fresh_idx(args.reps - 1, N, Vv)))
        got = np.asarray(out).ravel()
        print("  exact" if np.array_equal(got, ref) else "  MISMATCH")

    if want("pallas_stream"):
        def kern(tab_ref, idx_ref, out_ref):
            s = pl.program_id(0)
            base = s * C
            loc = idx_ref[:] - base
            inb = (loc >= 0) & (loc < C)
            vals = jnp.take(tab_ref[:], jnp.clip(loc, 0, C - 1), axis=0)
            @pl.when(s == 0)
            def _():
                out_ref[:] = jnp.where(inb, vals, 0.0)
            @pl.when(s > 0)
            def _():
                out_ref[:] = jnp.where(inb, vals, out_ref[:])
        def stream_take(t, i):
            return pl.pallas_call(
                kern,
                grid=(S,),
                out_shape=jax.ShapeDtypeStruct((N // 128, 128),
                                               jnp.float32),
                in_specs=[
                    pl.BlockSpec((C,), lambda s: (s,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((N // 128, 128), lambda s: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((N // 128, 128), lambda s: (0, 0),
                                       memory_space=pltpu.VMEM),
                interpret=args.interpret,
            )(t, i.reshape(N // 128, 128))
        out = bench("pallas_stream", lambda r: (table, fresh_idx(r)),
                    stream_take)
        ref = np.take(np.asarray(table),
                      np.asarray(fresh_idx(args.reps - 1)))
        got = np.asarray(out).ravel()
        print("  exact" if np.array_equal(got, ref) else "  MISMATCH")

    if want("pallas_binned"):
        def kern(tab_ref, idx_ref, out_ref):
            s = pl.program_id(0)
            out_ref[:] = jnp.take(tab_ref[:], idx_ref[:] - s * C, axis=0)
        def binned_take(t, ib):
            return pl.pallas_call(
                kern,
                grid=(S,),
                out_shape=jax.ShapeDtypeStruct((S, K // 128, 128),
                                               jnp.float32),
                in_specs=[
                    pl.BlockSpec((C,), lambda s: (s,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, K // 128, 128), lambda s: (s, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, K // 128, 128),
                                       lambda s: (s, 0, 0),
                                       memory_space=pltpu.VMEM),
                interpret=args.interpret,
            )(t, ib.reshape(S, K // 128, 128))
        out = bench("pallas_binned", lambda r: (table, fresh_binned(r)),
                    binned_take)
        ib = np.asarray(fresh_binned(args.reps - 1))
        ref = np.take(np.asarray(table), ib.ravel())
        got = np.asarray(out).ravel()
        print("  exact" if np.array_equal(got, ref) else "  MISMATCH")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"V": V, "N": N, "S": S,
                       "platform": jax.default_backend(),
                       "results": results}, f, indent=1)
        print("wrote", args.json_out)


if __name__ == "__main__":
    main()
