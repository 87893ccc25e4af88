"""Microbenchmarks for the SpMM gather ceiling on one TPU chip.

The bucketed-ELLPACK SpMM (`ops/spmm.py`) is bound by the row-gather
descriptor rate (~145M gathered rows/s measured in r2, ~12% of HBM
speed-of-light at D=128 f32). This probe measures, on real hardware:

  1. xla_gather        — plain one-shot XLA row gather (the known bound)
  2. xla_gather_bf16   — same with bf16 rows (half the bytes/descriptor)
  3. xla_gather_2par   — two independent half-size gathers in one jit
                         (is the bound per-gather-op or global?)
  4. xla_gather_wide   — D=256 rows (does GB/s scale with descriptor size?)
  5. pallas_dma_gather — Pallas kernel, per-row async DMAs, double-buffered
  6. pallas_vmem_gather— Pallas kernel, table resident in VMEM, vectorized
                         dynamic gather (tests Mosaic's dynamic-gather path)

Run: python scripts/spmm_probe.py   (prints one JSON line per probe)
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, rows, d, bytes_per_elt, dt, extra=None):
    rec = {
        "probe": name,
        "rows_per_s": round(rows / dt),
        "gbytes_per_s": round(rows * d * bytes_per_elt / dt / 1e9, 1),
        "ms": round(dt * 1e3, 3),
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main():
    n, d = 1_000_000, 128
    e = 20_000_000
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, d), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (e,), 0, n, jnp.int32)

    # 1. plain gather (sum-reduce output to keep D2H out of timing)
    @jax.jit
    def g1(x, idx):
        return x[idx].sum(axis=0)

    dt = timed(g1, x, idx)
    report("xla_gather", e, d, 4, dt)

    # 2. bf16 rows
    xb = x.astype(jnp.bfloat16)

    @jax.jit
    def g2(x, idx):
        return x[idx].sum(axis=0)

    dt = timed(g2, xb, idx)
    report("xla_gather_bf16", e, d, 2, dt)

    # 3. two parallel half gathers
    h = e // 2

    @jax.jit
    def g3(x, idx):
        a = x[idx[:h]].sum(axis=0)
        b = x[idx[h:]].sum(axis=0)
        return a + b

    dt = timed(g3, x, idx)
    report("xla_gather_2par", e, d, 4, dt)

    # 3b. four parallel quarter gathers
    q = e // 4

    @jax.jit
    def g3b(x, idx):
        parts = [
            x[idx[i * q:(i + 1) * q]].sum(axis=0) for i in range(4)
        ]
        return sum(parts)

    dt = timed(g3b, x, idx)
    report("xla_gather_4par", e, d, 4, dt)

    # 4. wide rows D=256 (half the rows, same bytes)
    x4 = jax.random.normal(key, (n // 2, 256), jnp.float32)
    idx4 = jax.random.randint(
        jax.random.PRNGKey(2), (e // 2,), 0, n // 2, jnp.int32
    )

    @jax.jit
    def g4(x, idx):
        return x[idx].sum(axis=0)

    dt = timed(g4, x4, idx4)
    report("xla_gather_wide", e // 2, 256, 4, dt)

    # 4b. sorted indices (does locality help the gather unit?)
    idx_sorted = jnp.sort(idx)
    dt = timed(g1, x, idx_sorted)
    report("xla_gather_sorted", e, d, 4, dt)

    # 5/6: Pallas probes
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
    except Exception as exc:  # pragma: no cover
        print(json.dumps({"probe": "pallas_import", "error": str(exc)}))
        return

    # 5. per-row DMA gather: grid over tiles of T rows; cols tile in SMEM
    # via scalar prefetch; 2-deep double buffering of [T, D] scratch.
    T = 256
    e_small = 2_000_000  # keep compile+run short
    idx5 = np.asarray(idx[:e_small], np.int32)
    n_tiles = e_small // T

    def dma_kernel(idx_ref, x_hbm, o_ref, scratch, sems):
        t = pl.program_id(0)

        def issue(slot, tile):
            base = tile * T

            def body(i, _):
                row = idx_ref[base + i]
                pltpu.make_async_copy(
                    x_hbm.at[row], scratch.at[slot, i], sems.at[slot, i]
                ).start()
                return 0

            jax.lax.fori_loop(0, T, body, 0)

        def wait(slot):
            def body(i, _):
                pltpu.make_async_copy(
                    x_hbm.at[0], scratch.at[slot, i], sems.at[slot, i]
                ).wait()
                return 0

            jax.lax.fori_loop(0, T, body, 0)

        @pl.when(t == 0)
        def _():
            issue(0, 0)

        @pl.when(t + 1 < pl.num_programs(0))
        def _():
            issue((t + 1) % 2, t + 1)

        wait(t % 2)
        o_ref[:] = scratch[t % 2].sum(axis=0, keepdims=True)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, d), lambda t, idx: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, T, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, T)),
        ],
    )

    try:
        pallas_gather = pl.pallas_call(
            dma_kernel,
            out_shape=jax.ShapeDtypeStruct((n_tiles, d), jnp.float32),
            grid_spec=grid_spec,
        )

        @jax.jit
        def g5(idx, x):
            return pallas_gather(idx, x).sum(axis=0)

        dt = timed(g5, jnp.asarray(idx5), x)
        report("pallas_dma_gather", e_small, d, 4, dt)
    except Exception as exc:
        print(json.dumps(
            {"probe": "pallas_dma_gather", "error": repr(exc)[:400]}
        ), flush=True)

    # 6. VMEM-resident table + vectorized dynamic gather
    C = 8192  # table rows in VMEM (8192*128*4 = 4 MB)
    m = 2_000_000
    tbl = jax.random.normal(key, (C, d), jnp.float32)
    idx6 = jax.random.randint(jax.random.PRNGKey(3), (m,), 0, C, jnp.int32)
    TI = 8192  # indices per grid step

    def vmem_kernel(tbl_ref, idx_ref, o_ref):
        rows = tbl_ref[idx_ref[:], :]  # vectorized dynamic gather?
        o_ref[:] = rows.sum(axis=0, keepdims=True)

    try:
        vmem_gather = pl.pallas_call(
            vmem_kernel,
            out_shape=jax.ShapeDtypeStruct((m // TI, d), jnp.float32),
            grid=(m // TI,),
            in_specs=[
                pl.BlockSpec((C, d), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TI,), lambda t: (t,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, d), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
        )

        @jax.jit
        def g6(tbl, idx):
            return vmem_gather(tbl, idx).sum(axis=0)

        dt = timed(g6, tbl, idx6)
        report("pallas_vmem_gather", m, d, 4, dt)
    except Exception as exc:
        print(json.dumps(
            {"probe": "pallas_vmem_gather", "error": repr(exc)[:400]}
        ), flush=True)

    # 6b. XLA equivalent of the VMEM gather for comparison
    @jax.jit
    def g6x(tbl, idx):
        return tbl[idx].sum(axis=0)

    dt = timed(g6x, tbl, idx6)
    report("xla_small_table_gather", m, d, 4, dt)


if __name__ == "__main__":
    main()
