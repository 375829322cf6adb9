"""Round-3 kernel lab, part f: kill the count kernel's lo-one-hot relayout.

lab3e decomposition at T32768: full 0.576 ns/el, nolo 0.364 (= the pure
int8 dot rate), nohi 0.568 -> the (1,T)->(T,1) lane-to-sublane relayout
behind the lo one-hot costs ~0.21 ns/el.  Variant cB replaces it with
per-128-chunk single-vreg transposes: lo2d rows (1,128) -> (128,1), then
a sublane-broadcast compare builds each (128,128) one-hot chunk; chunks
concat into the (T,128) operand of ONE dot.

Usage: python benchmarks/kernel_lab3f.py > logs/kernel_lab3f.log 2>&1
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
INTERPRET = os.environ.get("LAB_INTERPRET", "0") == "1"


def log(*a):
    print(*a, flush=True)


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jax.device_get(leaf.ravel()[0]))


def bench(name, fn, args, n_el, reps=3, t_null=0.0):
    try:
        t0 = time.time()
        out = fn(*args)
        sync(out)
        tc = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            sync(out)
            ts.append(time.time() - t0)
        t = min(ts)
        net = max(t - t_null, 1e-9)
        log(f"{name:38s} compile={tc:6.1f}s steady={t*1e3:8.2f} ms "
            f"net={net*1e3:8.2f} ms ({net/n_el*1e9:6.3f} ns/el)")
        return out, t
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        log(f"{name:38s} FAILED {type(e).__name__}: {msg}")
        return None, None


def make_count_cb(tile, chunkrows=1):
    """chunkrows: lo2d rows transposed per step (1 -> (1,128)->(128,1))."""
    hi_n, lo_n = 512, 128

    def kernel(codes_ref, codes2_ref, out_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        codes = codes_ref[0]                    # (1, tile)
        valid = (codes >> 16) & 1
        c = codes & 0xFFFF
        hi = jnp.where(valid == 1, c >> 7, -1)
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, tile), 0)
        oht = (jnp.broadcast_to(hi, (hi_n, tile)) == iota_hi).astype(
            jnp.int8)

        lo2d = codes2_ref[0] & (lo_n - 1)       # (tile//128, 128)
        iota_l = jax.lax.broadcasted_iota(
            jnp.int32, (chunkrows * LANES, LANES), 1)
        chunks = []
        for r in range(0, tile // LANES, chunkrows):
            col = jnp.transpose(lo2d[r:r + chunkrows, :]).reshape(
                chunkrows * LANES, 1)
            chunks.append(
                (jnp.broadcast_to(col, (chunkrows * LANES, LANES))
                 == iota_l).astype(jnp.int8))
        ol2 = jnp.concatenate(chunks, axis=0)   # (tile, 128)
        acc_ref[:] += jax.lax.dot_general(
            oht, ol2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(step == pl.num_programs(0) - 1)
        def _fin():
            out_ref[:] = acc_ref[:]

    @jax.jit
    def f(flat):
        g = flat.shape[0] // tile
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[
                pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile // LANES, LANES),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((hi_n, lo_n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hi_n, lo_n), jnp.int32),
            scratch_shapes=[pltpu.VMEM((hi_n, lo_n), jnp.int32)],
            interpret=INTERPRET,
        )(flat.reshape(g, 1, tile), flat.reshape(g, tile // LANES, LANES))

    return f


def make_count_cd(tile):
    """cD: transpose the whole (tile//128, 128) lo2d at once -> (128, T/128),
    then per column chunk slice (128,1) — one big transpose per tile."""
    hi_n, lo_n = 512, 128

    def kernel(codes_ref, codes2_ref, out_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        codes = codes_ref[0]
        valid = (codes >> 16) & 1
        c = codes & 0xFFFF
        hi = jnp.where(valid == 1, c >> 7, -1)
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, tile), 0)
        oht = (jnp.broadcast_to(hi, (hi_n, tile)) == iota_hi).astype(
            jnp.int8)

        lo2d = codes2_ref[0] & (lo_n - 1)
        loT = jnp.transpose(lo2d)               # (128, tile//128)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        chunks = []
        for r in range(tile // LANES):
            col = loT[:, r:r + 1]               # (128, 1)
            chunks.append(
                (jnp.broadcast_to(col, (LANES, LANES)) == iota_l).astype(
                    jnp.int8))
        ol2 = jnp.concatenate(chunks, axis=0)
        acc_ref[:] += jax.lax.dot_general(
            oht, ol2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(step == pl.num_programs(0) - 1)
        def _fin():
            out_ref[:] = acc_ref[:]

    @jax.jit
    def f(flat):
        g = flat.shape[0] // tile
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[
                pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile // LANES, LANES),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((hi_n, lo_n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hi_n, lo_n), jnp.int32),
            scratch_shapes=[pltpu.VMEM((hi_n, lo_n), jnp.int32)],
            interpret=INTERPRET,
        )(flat.reshape(g, 1, tile), flat.reshape(g, tile // LANES, LANES))

    return f


def main():
    log(f"devices={jax.devices()} jax={jax.__version__}")
    n = 6144 * 8192
    rng = np.random.default_rng(0)
    codes_h = rng.integers(0, 1 << 16, size=n, dtype=np.int32)
    aug = jax.device_put(codes_h | (3 << 16))
    sync((aug,))
    log(f"n={n:,} staged")

    nul = jax.jit(lambda x: x[:8] * 2)
    _, t_null = bench("null dispatch", nul, (aug,), n)

    ref = np.bincount(codes_h, minlength=1 << 16)
    from kmer_spans_tpu.ops.pallas_kernels import pallas_count_aug
    out, _ = bench("cA prod pallas_count_aug T16384",
                   lambda a: pallas_count_aug(a, 8, tile=16384), (aug,), n,
                   t_null=t_null)
    if out is not None:
        log(f"  correctness: "
            f"{'OK' if np.array_equal(np.asarray(out), ref) else 'MISMATCH'}")
    for tile, cr in [(16384, 1), (32768, 1)]:
        out, _ = bench(f"cB T{tile} chunkrows{cr}", make_count_cb(tile, cr),
                       (aug,), n, t_null=t_null)
        if out is not None:
            ok = np.array_equal(np.asarray(out).reshape(-1), ref)
            log(f"  correctness: {'OK' if ok else 'MISMATCH'}")
    for tile in (16384, 32768):
        out, _ = bench(f"cD T{tile} one-transpose", make_count_cd(tile),
                       (aug,), n, t_null=t_null)
        if out is not None:
            ok = np.array_equal(np.asarray(out).reshape(-1), ref)
            log(f"  correctness: {'OK' if ok else 'MISMATCH'}")

    log("lab done")


if __name__ == "__main__":
    main()
