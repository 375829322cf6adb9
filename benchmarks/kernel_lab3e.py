"""Round-3 kernel lab, part e: where does the count kernel's ~0.2 ns/el
non-dot overhead go, and can iota-as-input one-hot builds shave it?
Plus: the 2-bit-class fused screen (rows=32) timing.

Usage: python benchmarks/kernel_lab3e.py > logs/kernel_lab3e.log 2>&1
"""

from __future__ import annotations

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


def make_count_probe(tile, mode):
    """mode: full | nolo (const lo one-hot) | nohi | nodot | iota16 | iota8."""
    hi_n, lo_n = 512, 128

    def kernel(codes_ref, ihi_ref, out_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        codes = codes_ref[0]
        valid = (codes >> 16) & 1
        c = codes & 0xFFFF
        hi = jnp.where(valid == 1, c >> 7, -1)
        lo = (c & (lo_n - 1)).reshape(tile, 1)
        if mode == "iota16":
            oht = (jnp.broadcast_to(hi, (hi_n, tile)).astype(jnp.int16)
                   == ihi_ref[:, :1].astype(jnp.int16)).astype(jnp.int8)
        elif mode == "iota8":
            hi8 = jnp.where(valid == 1, c >> 7, 513)
            oht = (jnp.broadcast_to(hi8, (hi_n, tile)).astype(jnp.int16)
                   == ihi_ref[:, :1].astype(jnp.int16)).astype(jnp.int8)
        else:
            iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, tile), 0)
            oht = (jnp.broadcast_to(hi, (hi_n, tile)) == iota_hi).astype(
                jnp.int8)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (tile, lo_n), 1)
        ol2 = (jnp.broadcast_to(lo, (tile, lo_n)) == iota_lo).astype(
            jnp.int8)
        if mode == "nodot":
            acc_ref[:, :1] += jnp.sum(
                oht, axis=1, keepdims=True, dtype=jnp.int32)[:hi_n]
            acc_ref[:lo_n, 1:2] += jnp.sum(
                ol2, axis=0, dtype=jnp.int32).reshape(lo_n, 1)
            return
        if mode == "nolo":
            ol2 = jnp.ones((tile, lo_n), jnp.int8)
        if mode == "nohi":
            oht = jnp.ones((hi_n, tile), jnp.int8)
        acc_ref[:] += jax.lax.dot_general(
            oht, ol2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(step == pl.num_programs(0) - 1)
        def _fin():
            out_ref[:] = acc_ref[:]

    @jax.jit
    def f(flat, ihi):
        g = flat.shape[0] // tile
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[
                pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hi_n, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((hi_n, lo_n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hi_n, lo_n), jnp.int32),
            scratch_shapes=[pltpu.VMEM((hi_n, lo_n), jnp.int32)],
            interpret=INTERPRET,
        )(flat.reshape(g, 1, tile), ihi)

    return f


def main():
    import benchmarks.kernel_lab3d as d

    log(f"devices={jax.devices()} jax={jax.__version__}")
    n = 6144 * 8192
    rng = np.random.default_rng(0)
    codes_h = rng.integers(0, 1 << 16, size=n, dtype=np.int32)
    aug = jax.device_put(codes_h | (3 << 16))
    sync((aug,))
    log(f"n={n:,} staged")

    nul = jax.jit(lambda x: x[:8] * 2)
    _, t_null = bench("null dispatch", nul, (aug,), n)

    ihi = jax.device_put(
        np.broadcast_to(np.arange(512, dtype=np.int32)[:, None],
                        (512, 128)).copy())
    ref = np.bincount(codes_h, minlength=1 << 16)
    for tile in (16384, 32768):
        for mode in ("full", "nolo", "nohi", "nodot", "iota16"):
            out, _ = bench(f"count T{tile} {mode}",
                           make_count_probe(tile, mode), (aug, ihi), n,
                           t_null=t_null)
            if out is not None and mode in ("full", "iota16"):
                ok = np.array_equal(np.asarray(out).reshape(-1), ref)
                log(f"  correctness: {'OK' if ok else 'MISMATCH'}")

    # 2-bit-class fused screen: rows=32 table
    tabw2 = jnp.asarray(rng.integers(
        -(1 << 31), 1 << 31, size=4096, dtype=np.int64).astype(np.int32))
    tabR2 = d.prerolled(tabw2)

    def make_fused2(rows, sub_blocks, block=8192):
        BR = sub_blocks * (block // LANES)
        R_OUT = max(8, 4 * sub_blocks)

        def kernel(codes_ref, thr_ref, tab_ref, out_ref):
            aug_ = codes_ref[0]
            sc = ((aug_ >> 17) & 1) == 1
            c = aug_ & 0xFFFF
            widx = c >> 4          # 16 entries per word (2-bit classes)
            lo = widx & (LANES - 1)
            row = widx >> 7
            p = jax.lax.broadcasted_iota(jnp.int32, (BR, LANES), 0) & 7
            sel = (row & ~7) | ((p - row) & 7)
            G = BR // 8
            los = [lo[8 * m:8 * m + 8] for m in range(G)]
            sels = [sel[8 * m:8 * m + 8] for m in range(G)]
            accs = [jnp.zeros((8, LANES), jnp.int32) for _ in range(G)]
            for j in range(rows):
                dd, w = j & 7, j >> 3
                win = tab_ref[dd, 8 * w:8 * w + 8, :]
                for m in range(G):
                    g = jnp.take_along_axis(win, los[m], axis=1)
                    accs[m] = jnp.where(sels[m] == j, g, accs[m])
            words = jnp.concatenate(accs, axis=0)
            nib = (words >> ((c & 15) * 2)) & 3
            s = (nib + 1) * 1024 + 3 - thr_ref[0, 0]
            a = jnp.where(sc, s, 0)
            br = block // LANES
            for b in range(sub_blocks):
                tA, tB, mA, mB = d._summaries_fullwidth(
                    a[br * b:br * b + br], sc[br * b:br * b + br])
                for q, v in enumerate((tA, tB, mA, mB)):
                    i = q * sub_blocks + b
                    out_ref[0, i:i + 1, :] = v

        @jax.jit
        def f(tabR, aug_, thr_q):
            nn = aug_.shape[0]
            step = BR * LANES
            nb = nn // step
            out = pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((1, BR, LANES), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((8, rows, LANES), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, R_OUT, LANES),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nb, R_OUT, LANES),
                                               jnp.int32),
                interpret=INTERPRET,
            )(aug_.reshape(nb, BR, LANES), thr_q.reshape(1, 1), tabR)
            o = out[:, :4 * sub_blocks, 0].reshape(nb, 4, sub_blocks)
            return (o[:, 0].reshape(-1), o[:, 1].reshape(-1),
                    o[:, 2].reshape(-1), o[:, 3].reshape(-1))

        return f

    thr_q = jnp.int32(3071)
    for sb in (4, 8):
        out, _ = bench(f"fused 2bit SB{sb} rows32", make_fused2(32, sb),
                       (tabR2, aug, thr_q), n, t_null=t_null)
        if out is not None:
            words = np.asarray(tabw2)[codes_h >> 4]
            nib = (words >> ((codes_h & 15) * 2)) & 3
            s = (nib + 1) * 1024 + 3 - 3071
            A = np.cumsum(s.reshape(-1, 8192), axis=1)
            ok = (np.array_equal(np.asarray(out[0]), A[:, -1])
                  and np.array_equal(np.asarray(out[2]), A.max(axis=1)))
            log(f"  correctness: {'OK' if ok else 'MISMATCH'}")

    log("lab done")


if __name__ == "__main__":
    main()
