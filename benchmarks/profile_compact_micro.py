"""Round-5: micro-attribution of the keys-kernel compaction alternatives.

The gather-assembly redesign lost ~1 ms end-to-end against the shift-round
scheme despite an op-count model predicting a win. This isolates the three
candidate cost centers as standalone Pallas kernels over the SAME shapes
the keys kernel uses per block (rows=256, W=512, C=4, k2=256):

  rounds9   : 9 LSB-first shift rounds on (256, 512) int32 x 4 chunks +
              8 rounds on (256, 256) — the production compaction.
  rounds7   : 7 rounds x 4 chunks only (the subgroup-local variant's
              shift share, no assembly).
  gather    : 2 x 16-bank dynamic-gather pieces assembling (256, 256)
              from (256, 2048) int32.
  wherechain: 15 compare + 15 select prefix-search on (256, 256).

cd /root/repo && python benchmarks/profile_compact_micro.py
"""

from __future__ import annotations

import functools
import json
import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

ROWS, W, C, K2 = 256, 512, 4, 256


def _k_rounds(x_ref, o_ref, *, nrounds: int, chunks: int, width: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    acc = jnp.zeros((ROWS, width), jnp.int32)
    wiota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, width), 1)
    for c in range(chunks):
        work = x_ref[0, :, c * width : (c + 1) * width]
        s = 1
        for _ in range(nrounds):
            w_in = pltpu.roll(work, width - s, axis=1)
            move_in = ((w_in & s) != 0) & (wiota < width - s)
            stay = (work & s) == 0
            work = jnp.where(move_in, w_in - s, jnp.where(stay, work, 0))
            s *= 2
        acc = acc ^ work
    o_ref[0] = acc[:, :K2]


def _k_gather(x_ref, li_ref, bi_ref, o_ref):
    import jax.numpy as jnp

    out_pieces = []
    for p0 in range(0, K2, 128):
        lip = li_ref[0, :, p0 : p0 + 128]
        bip = bi_ref[0, :, p0 : p0 + 128]
        gp = jnp.zeros((ROWS, 128), jnp.int32)
        for k in range((C * W) // 128):
            bank = x_ref[0, :, k * 128 : (k + 1) * 128]
            vals = jnp.take_along_axis(bank, lip, axis=1)
            gp = jnp.where(bip == k, vals, gp)
        out_pieces.append(gp)
    o_ref[0] = jnp.concatenate(out_pieces, axis=1)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = 256  # grid blocks ~ one bench batch's worth (32 clouds x 8 row-blocks)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 20, size=(B, ROWS, C * W)).astype(np.int32))
    li = jnp.asarray(rng.integers(0, 128, size=(B, ROWS, K2)).astype(np.int32))
    bi = jnp.asarray(rng.integers(0, (C * W) // 128, size=(B, ROWS, K2)).astype(np.int32))
    print(f"backend: {jax.default_backend()}", flush=True)

    def timed(name, fn, *args, iters=10):
        # CHAINED dispatch: each call's eps depends on the previous output —
        # un-chained per-call block_until_ready over the axon tunnel lets the
        # queue pipeline and reads pure throughput-of-nothing (first version
        # measured 0.14 ms for a kernel that must move 537 MB)
        jfn = jax.jit(fn)

        def chain(n):
            eps = jnp.int32(0)
            out = None
            for _ in range(n):
                out = jfn(eps, *args)
                eps = out[0, 0, 0] * 0
            return int(out[0, 0, 0])

        chain(2)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            chain(iters)
            ts.append((time.perf_counter() - t0) / iters)
        dt = min(ts) * 1e3
        print(f"{name:24s} {dt:8.2f} ms", flush=True)
        return dt

    blkx = pl.BlockSpec((1, ROWS, C * W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    blki = pl.BlockSpec((1, ROWS, K2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    outspec = pl.BlockSpec((1, ROWS, K2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((B, ROWS, K2), jnp.int32)

    results = {}

    def rounds_fn(nr):
        kern = functools.partial(_k_rounds, nrounds=nr, chunks=C, width=W)
        return lambda e, xx: pl.pallas_call(
            kern, grid=(B,), in_specs=[blkx], out_specs=outspec, out_shape=oshape
        )(xx + e)

    results["rounds9x4"] = timed("rounds 9x4 (production)", rounds_fn(9), x)
    results["rounds7x4"] = timed("rounds 7x4 (subgroup)", rounds_fn(7), x)

    gather = lambda e, xx, l, b: pl.pallas_call(
        _k_gather, grid=(B,), in_specs=[blkx, blki, blki], out_specs=outspec, out_shape=oshape
    )(xx + e, l, b)
    results["gather_2x16"] = timed("gather 2 pieces x 16 banks", gather, x, li, bi)

    def wherechain(e, l):
        # per-row (ROWS, 1) prefix columns like the real kernel's sg_cnt sums
        def kern(li_ref, o_ref):
            base = li_ref[0, :, 0:128]  # (ROWS, 128) source for per-row prefixes
            pref = [jnp.sum(base * (k + 1), axis=1, keepdims=True) % 64 for k in range(16)]
            giota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, K2), 1)
            c_of = sum((pref[k] + k <= giota).astype(jnp.int32) for k in range(15))
            cumb = pref[0] + jnp.zeros_like(giota)
            for k in range(1, 16):
                cumb = jnp.where(c_of == k, pref[k], cumb)
            o_ref[0] = c_of * 64 + (giota - cumb)

        return pl.pallas_call(
            kern, grid=(B,), in_specs=[blki], out_specs=outspec, out_shape=oshape
        )(l + e)

    results["wherechain_15"] = timed("prefix-search 15cmp+15sel", wherechain, li)

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
