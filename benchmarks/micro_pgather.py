"""Microbench: can anything beat XLA's big-table gather?

Round-3 anatomy (PERF.md): the medical class spends ~180 ms of a 320 ms
render in 61 full-width iterations, each paying one 262144-row gather
into the 67 MB flat density table at ~88 M rows/s — ~0.35 GB/s of
effective bandwidth against a v5e's ~800 GB/s HBM.  The 1024^3 class
pays the same wall at ~40 M rows/s into a 4.3 GB table.  This bench
establishes the ceiling for every candidate replacement BEFORE a full
tracking kernel is built around one (round-4 VERDICT task 1).

Protocol note: ONE gather per dispatch measures only the ~25 ms
axon-tunnel dispatch floor (first bench revision proved this: every
variant timed exactly 25.1-25.7 ms).  Each variant therefore runs
--inner iterations inside one jit with per-iteration index variation
(j = i+k, wrapped) and a data dependency through the accumulator, and
reports time/inner.  Fresh random indices per rep (tunnel result-reuse
pitfall), host-readback fence, rep 0 discarded.

Variants (select with --only; each safe to run alone in its own process
so a Mosaic compile crash cannot take the whole suite down):

  xla_big        jnp.take from the full table — THE WALL (baseline)
  xla_sorted     same with pre-sorted indices (locality probe)
  xla_slice      per-shard dynamic_slice + take on perfectly binned
                 indices (does a fresh 4 MB sub-table ride XLA's
                 small-table fast path?)
  xla_batched    one batched gather, operand batch dims (S, C)x(S, K)
  xla_small      take from a table that IS small (1 MB / 4 MB): the
                 fast-path rate the binned designs hope to reach
  bin_argsort    jnp.argsort(shard_id) + permute at N (binning lever 1)
  bin_scatter    cumsum-rank + permutation scatter (binning lever 2)
  perm_gather    one (N,)->(N,) permutation gather (the unavoidable
                 unpermute in any sort-based design)
  pallas_vmem    in-kernel jnp.take, table fully VMEM-resident (the
                 central unknown: Mosaic's VMEM gather rate)
  pallas_stream  grid over S shards, every lane masked-taken per shard
  pallas_binned  grid over S shards, perfectly pre-binned indices,
                 Pallas pipelines the shard DMA (the real design's
                 steady-state economics)

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
    ap.add_argument("--inner", type=int, default=16,
                    help="gathers per dispatch (amortizes the ~25 ms "
                    "tunnel dispatch floor)")
    ap.add_argument("--reps", type=int, default=4)
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
    INNER = args.inner
    rng = np.random.default_rng(0)
    print(f"table {V} rows ({V*4/2**20:.0f} MB) N={N} S={S} "
          f"shard {C*4/2**20:.1f} MB inner={INNER} "
          f"platform={jax.default_backend()}")

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

    def looped(core, lim, wrap_shard=False):
        """Run core(t, j) INNER times with j = i+k wrapped into [0,lim)
        (or within each shard when wrap_shard), accumulating results so
        iterations cannot be CSE'd or reordered away."""
        def f(t, i):
            if wrap_shard:
                base = (i // C) * C
            def body(k, acc):
                j = i + k
                if wrap_shard:
                    j = jnp.where(j >= base + C, j - C, j)
                else:
                    j = jnp.where(j >= lim, j - lim, j)
                return acc + core(t, j)
            return jax.lax.fori_loop(
                0, INNER, body,
                jnp.zeros(i.shape, jnp.float32))
        return f

    def bench(name, make_inputs, fn, rows_per_call=None):
        fn = jax.jit(fn)
        rows = (rows_per_call or N) * INNER
        times = []
        for rep in range(args.reps):
            inp = make_inputs(rep)
            for x in inp:
                jax.block_until_ready(x)
            t0 = time.time()
            out = fn(*inp)
            s = float(jnp.asarray(out).ravel()[:8].sum())  # host fence
            dt = time.time() - t0
            times.append(dt)
            print(f"  {name} rep{rep}: {dt*1e3:8.2f} ms "
                  f"({rows/dt/1e6:7.1f} M rows/s)  chk {s:.2f}",
                  flush=True)
        best = min(times[1:]) if len(times) > 1 else times[0]
        rate = rows / best / 1e6
        print(f"{name}: best {best*1e3:.2f} ms = {rate:.1f} M rows/s",
              flush=True)
        results[name] = {"ms_per_gather": best * 1e3 / INNER,
                         "mrows_s": rate}

    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    # -- XLA baselines -----------------------------------------------------
    if want("xla_big"):
        bench("xla_big", lambda r: (table, fresh_idx(r)),
              looped(lambda t, j: jnp.take(t, j), V))
    if want("xla_sorted"):
        bench("xla_sorted",
              lambda r: (table, jnp.sort(fresh_idx(r))),
              looped(lambda t, j: jnp.take(t, j), V))
    if want("xla_slice"):
        def slice_take(t, jb):  # jb (S, K) globally-indexed, binned
            def one(args_):
                s, loc = args_
                sh = jax.lax.dynamic_slice(t, (s * C,), (C,))
                return jnp.take(sh, loc - s * C)
            return jax.lax.map(one, (jnp.arange(S, dtype=jnp.int32), jb))
        bench("xla_slice", lambda r: (table, fresh_binned(r)),
              looped(slice_take, V, wrap_shard=True))
    if want("xla_batched"):
        t3 = table.reshape(S, C)
        def batched(t, jb):
            return jax.vmap(lambda tt, ii: jnp.take(tt, ii))(t, jb % C)
        bench("xla_batched", lambda r: (t3, fresh_binned(r)),
              looped(batched, V, wrap_shard=True))
    if want("xla_small"):
        for mb, tag in ((1.0, "1mb"), (4.0, "4mb")):
            Vs = int(mb * (1 << 20) // 4)
            tabs = table[:Vs]
            bench(f"xla_small_{tag}",
                  lambda r, Vs=Vs: (tabs, fresh_idx(r, N, Vs)),
                  looped(lambda t, j: jnp.take(t, j), Vs))
    if want("xla_wide"):
        # (R, 2) row gathers: the round-3 probe-table class (measured
        # ~367 M rows/s in-context at <=1 MB).  Does the class hold
        # today, and how does it fall off with table size?
        for rows, tag in ((131072, "1mb"), (1 << 20, "8mb"),
                          (1 << 21, "16mb")):
            if rows * 2 > V:
                continue
            t2 = table[: rows * 2].reshape(rows, 2)
            bench(f"xla_wide_{tag}",
                  lambda r, rows=rows: (t2, fresh_idx(r, N, rows)),
                  looped(lambda t, j: jnp.take(t, j, axis=0).sum(-1),
                         rows))
    if want("xla_packed"):
        # simulated 4-bit packed density table: V voxels in (V/16, 2)
        # int32 rows (16 nibbles per row).  A tap = one wide row gather
        # + VPU nibble extract.  Table shrinks 8x vs f32 -> rate-class
        # jump; measures gather + unpack together.
        Vp = max(V // 16, 1024)
        tp = jnp.asarray(
            np.random.default_rng(5).integers(
                0, 1 << 31, (Vp, 2)).astype(np.int32))
        def packed_take(t, j):
            row = jnp.take(t, j >> 4, axis=0)          # (N, 2) int32
            word = jnp.where(((j >> 3) & 1) == 0, row[:, 0], row[:, 1])
            nib = (word >> ((j & 7) << 2)) & 0xF
            return nib.astype(jnp.float32) * (1.0 / 15.0)
        bench("xla_packed", lambda r: (tp, fresh_idx(r)),
              looped(packed_take, V))
    if want("xla_packed8"):
        # 8-bit variant: (V/8, 2) int32 rows (8 bytes per row)
        Vp8 = max(V // 8, 1024)
        tp8 = jnp.asarray(
            np.random.default_rng(6).integers(
                0, 1 << 31, (Vp8, 2)).astype(np.int32))
        def packed8_take(t, j):
            row = jnp.take(t, j >> 3, axis=0)
            word = jnp.where(((j >> 2) & 1) == 0, row[:, 0], row[:, 1])
            byte = (word >> ((j & 3) << 3)) & 0xFF
            return byte.astype(jnp.float32) * (1.0 / 255.0)
    if want("xla_packed8f"):
        # 8-bit FLAT variant: (V/4,) uint32, one narrow gather from a
        # 4x-smaller table + 2-level where-select of the byte
        Vp8f = max(V // 4, 1024)
        tp8f = jnp.asarray(
            np.random.default_rng(7).integers(
                0, 1 << 31, Vp8f).astype(np.int32))
        def packed8f_take(t, j):
            word = jnp.take(t, j >> 2, axis=0)
            byte = (word >> ((j & 3) << 3)) & 0xFF
            return byte.astype(jnp.float32) * (1.0 / 255.0)
        bench("xla_packed8f", lambda r: (tp8f, fresh_idx(r)),
              looped(packed8f_take, V))
        bench("xla_packed8", lambda r: (tp8, fresh_idx(r)),
              looped(packed8_take, V))

    # -- binning / permutation costs ---------------------------------------
    shift = int(np.log2(C))
    if want("bin_argsort"):
        bench("bin_argsort", lambda r: (table, fresh_idx(r)),
              looped(lambda _, j: jnp.take(
                  j, jnp.argsort(j >> shift)).astype(jnp.float32), V))
    if want("bin_scatter"):
        def csort(_, i):
            sid = (i >> shift).astype(jnp.int32)
            oh = (sid[:, None] == jnp.arange(S, dtype=jnp.int32)[None, :])
            within = jnp.cumsum(oh.astype(jnp.int32), axis=0) - 1
            counts = within[-1] + 1
            base = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
            rank = jnp.take_along_axis(
                within, sid[:, None], axis=1)[:, 0]
            pos = jnp.take(base, sid) + rank
            return jnp.zeros(N, jnp.float32).at[pos].set(
                i.astype(jnp.float32), mode="drop", unique_indices=True)
        bench("bin_scatter", lambda r: (table, fresh_idx(r)),
              looped(csort, V))
    if want("perm_gather"):
        bench("perm_gather",
              lambda r: (fresh_idx(r, N, N).astype(jnp.float32),
                         fresh_idx(r + 100, N, N)),
              looped(lambda v, j: jnp.take(v, j), N))

    # -- Pallas ------------------------------------------------------------
    needs_pallas = any(want(x) for x in
                       ("pallas_vmem", "pallas_stream", "pallas_binned",
                        "pallas_taa1", "pallas_taa0"))
    if needs_pallas:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

    if want("pallas_taa1"):
        # The ONE gather form Mosaic lowers to tpu.dynamic_gather along
        # lanes: per-row 128-entry tables, indices shape == table shape
        # (lowering.py:_gather_lowering_rule).  Unusable for a shared
        # 67 MB table, but records the in-kernel ceiling of the
        # primitive every VMEM-window design would be built on.
        R = N // 128
        tab1 = table[: N].reshape(R, 128)
        def kern_taa1(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(
                tab_ref[:], idx_ref[:], axis=1)
        call_taa1 = pl.pallas_call(
            kern_taa1,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=args.interpret,
        )
        def core_taa1(t, j):
            return call_taa1(t, (j % 128).reshape(R, 128)).reshape(N)
        try:
            bench("pallas_taa1", lambda r: (tab1, fresh_idx(r, N, N)),
                  looped(core_taa1, N))
        except Exception as e:  # record the failure mode, keep going
            print(f"pallas_taa1 FAILED: {type(e).__name__}: {e}")
            results["pallas_taa1"] = {"error": str(e)[:200]}

    if want("pallas_taa0"):
        # dynamic_gather along SUBLANES (column-replicated shared
        # table).  Crashed the Mosaic compiler helper in rounds 1-3;
        # isolated here so a crash cannot take other variants down.
        R = N // 128
        tab0 = table[: N].reshape(R, 128)
        def kern_taa0(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(
                tab_ref[:], idx_ref[:], axis=0)
        call_taa0 = pl.pallas_call(
            kern_taa0,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=args.interpret,
        )
        def core_taa0(t, j):
            return call_taa0(t, (j % R).reshape(R, 128)).reshape(N)
        try:
            bench("pallas_taa0", lambda r: (tab0, fresh_idx(r, N, N)),
                  looped(core_taa0, N))
        except Exception as e:
            print(f"pallas_taa0 FAILED: {type(e).__name__}: {e}")
            results["pallas_taa0"] = {"error": str(e)[:200]}

    if want("pallas_vmem"):
        # table must fit VMEM alongside idx/out: cap at 8 MB
        Vv = min(V, (8 << 20) // 4)
        tabv = table[:Vv]
        def kern(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=args.interpret,
        )
        def core(t, j):
            return call(t, j.reshape(N // 128, 128)).reshape(N)
        try:
            bench("pallas_vmem", lambda r: (tabv, fresh_idx(r, N, Vv)),
                  looped(core, Vv))
        except Exception as e:
            print(f"pallas_vmem FAILED: {type(e).__name__}: {e}")
            results["pallas_vmem"] = {"error": str(e)[:200]}

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
        call = pl.pallas_call(
            kern,
            grid=(S,),
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec((C,), lambda s: (s,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N // 128, 128), lambda s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((N // 128, 128), lambda s: (0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=args.interpret,
        )
        def core(t, j):
            return call(t, j.reshape(N // 128, 128)).reshape(N)
        try:
            bench("pallas_stream", lambda r: (table, fresh_idx(r)),
                  looped(core, V))
        except Exception as e:
            print(f"pallas_stream FAILED: {type(e).__name__}: {e}")
            results["pallas_stream"] = {"error": str(e)[:200]}

    if want("pallas_binned"):
        def kern(tab_ref, idx_ref, out_ref):
            s = pl.program_id(0)
            out_ref[:] = jnp.take(tab_ref[:], idx_ref[:] - s * C, axis=0)
        call = pl.pallas_call(
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
        )
        def core(t, j):
            return call(t, j.reshape(S, K // 128, 128)).reshape(S, K)
        try:
            bench("pallas_binned", lambda r: (table, fresh_binned(r)),
                  looped(core, V, wrap_shard=True))
        except Exception as e:
            print(f"pallas_binned FAILED: {type(e).__name__}: {e}")
            results["pallas_binned"] = {"error": str(e)[:200]}

    # correctness spot-check for the enabled Pallas variants (un-looped)
    if want("pallas_vmem"):
        i0 = fresh_idx(0, N, min(V, (8 << 20) // 4))
        got = np.asarray(call(tabv, i0.reshape(N // 128, 128))).ravel() \
            if only == {"pallas_vmem"} else None
        if got is not None:
            ref = np.take(np.asarray(tabv), np.asarray(i0))
            print("  pallas_vmem exact:", bool(np.array_equal(got, ref)))

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"V": V, "N": N, "S": S, "inner": INNER,
                       "platform": jax.default_backend(),
                       "results": results}, f, indent=1)
        print("wrote", args.json_out)


if __name__ == "__main__":
    main()
