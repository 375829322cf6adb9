"""Round-3 kernel lab: count-matmul and screen-gather variants on real TPU.

Targets (from logs/phase_profile_r2a.log at 50M, net of the ~30ms sync tax):
  codes ~free | count(MXU) ~33ms (0.66 ns/el) | class screen ~44ms (0.88)
  | scan summaries ~16ms (0.32)
Goal: count <= 0.40 ns/el, screen+scan fused <= 0.25 ns/el, so the full
pipeline at 400Mb lands under 0.9 ns/base (>= 1.11 Gb/s, BASELINE.md).

Known Mosaic constraints (logs/kernel_lab_r2b.log): iota must be int16 or
int32 (int8 iota fails); build one-hots by comparing against an int16 iota
and casting the bool to int8.

Usage: python benchmarks/kernel_lab3.py > logs/kernel_lab3.log 2>&1
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
INTERPRET = os.environ.get('LAB_INTERPRET', '0') == '1'


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
        log(f"{name:34s} compile={tc:7.1f}s steady={t*1e3:9.2f} ms "
            f"net={net*1e3:9.2f} ms ({net/n_el*1e9:6.3f} ns/el)")
        return out, t
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        log(f"{name:34s} FAILED {type(e).__name__}: {msg}")
        return None, None


# ---------------------------------------------------------------- E1: MXU

def make_dot_probe(M, K, N, acc_dtype, reps=256):
    """Pure-MXU rate: grid of ``reps`` dots on VMEM-resident tiles."""
    acc32 = jnp.float32 if acc_dtype == jnp.float32 else jnp.int32

    def kernel(a_ref, b_ref, out_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        d = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        acc_ref[:] += d.astype(acc32)

        @pl.when(step == pl.num_programs(0) - 1)
        def _fin():
            out_ref[:] = acc_ref[:]

    @jax.jit
    def f(a, b):
        return pl.pallas_call(
            kernel,
            grid=(reps,),
            in_specs=[
                pl.BlockSpec((M, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, N), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), acc32),
            scratch_shapes=[pltpu.VMEM((M, N), acc32)],
                    interpret=INTERPRET,
        )(a, b)

    return f


# ------------------------------------------------------- E2: count variants

def make_count(tile, hi_bits, cmp16, acc16, aug=True):
    """Histogram of the low 16 bits of aug codes (valid bit 16)."""
    hi_n = 1 << hi_bits
    lo_n = (1 << 16) >> hi_bits
    assert lo_n >= LANES

    def kernel(codes_ref, out_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        codes = codes_ref[0]          # (1, tile) int32
        if aug:
            valid = (codes >> 16) & 1
            c = codes & 0xFFFF
            hi = jnp.where(valid == 1, c >> (16 - hi_bits), -1)
        else:
            c = codes
            hi = codes >> (16 - hi_bits)
        lo = (c & (lo_n - 1)).reshape(tile, 1)
        if cmp16:
            iota_hi = jax.lax.broadcasted_iota(jnp.int16, (hi_n, tile), 0)
            iota_lo = jax.lax.broadcasted_iota(jnp.int16, (tile, lo_n), 1)
            oht = (jnp.broadcast_to(hi.astype(jnp.int16), (hi_n, tile))
                   == iota_hi).astype(jnp.int8)
            ol2 = (jnp.broadcast_to(lo.astype(jnp.int16), (tile, lo_n))
                   == iota_lo).astype(jnp.int8)
        else:
            iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, tile), 0)
            iota_lo = jax.lax.broadcasted_iota(jnp.int32, (tile, lo_n), 1)
            oht = (jnp.broadcast_to(hi, (hi_n, tile)) == iota_hi).astype(
                jnp.int8)
            ol2 = (jnp.broadcast_to(lo, (tile, lo_n)) == iota_lo).astype(
                jnp.int8)
        d = jax.lax.dot_general(
            oht, ol2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int16 if acc16 else jnp.int32,
        )
        acc_ref[:] += d.astype(jnp.int32) if acc16 else d

        @pl.when(step == pl.num_programs(0) - 1)
        def _fin():
            out_ref[:] = acc_ref[:]

    @jax.jit
    def f(flat):
        g = flat.shape[0] // tile
        flat3 = flat.reshape(g, 1, tile)
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((hi_n, lo_n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hi_n, lo_n), jnp.int32),
            scratch_shapes=[pltpu.VMEM((hi_n, lo_n), jnp.int32)],
                    interpret=INTERPRET,
        )(flat3)

    return f


# ------------------------------------------------------ E3: gather variants

def prerolled(tab_words):
    W = tab_words.shape[0]
    rows = -(-W // LANES)
    rows = -(-rows // 8) * 8
    pad = rows * LANES - W
    if pad:
        tab_words = jnp.concatenate(
            [tab_words, jnp.zeros((pad,), tab_words.dtype)])
    tab2d = tab_words.reshape(rows, LANES)
    r = jnp.arange(rows, dtype=jnp.int32)
    return jnp.stack([tab2d[(r & ~7) | ((r - d) & 7)] for d in range(8)])


def make_gather_unrolled(rows, block_rows=64, stack=False):
    def kernel(idx_ref, tab_ref, out_ref):
        idx = idx_ref[0]                      # (BR, 128)
        lo = idx & (LANES - 1)
        row = idx >> 7
        p = jax.lax.broadcasted_iota(
            jnp.int32, (block_rows, LANES), 0) & 7
        sel = (row & ~7) | ((p - row) & 7)
        G = block_rows // 8
        if stack:
            acc = jnp.zeros((block_rows, LANES), jnp.int32)
            for j in range(rows):
                d, w = j & 7, j >> 3
                win = tab_ref[d, 8 * w:8 * w + 8, :]
                winB = jnp.concatenate([win] * G, axis=0)
                g = jnp.take_along_axis(winB, lo, axis=1)
                acc = jnp.where(sel == j, g, acc)
            out_ref[0] = acc
        else:
            los = [lo[8 * m:8 * m + 8] for m in range(G)]
            sels = [sel[8 * m:8 * m + 8] for m in range(G)]
            accs = [jnp.zeros((8, LANES), jnp.int32) for _ in range(G)]
            for j in range(rows):
                d, w = j & 7, j >> 3
                win = tab_ref[d, 8 * w:8 * w + 8, :]
                for m in range(G):
                    g = jnp.take_along_axis(win, los[m], axis=1)
                    accs[m] = jnp.where(sels[m] == j, g, accs[m])
            out_ref[0] = jnp.concatenate(accs, axis=0)

    @jax.jit
    def f(tabR, widx):
        n = widx.shape[0]
        step = block_rows * LANES
        nb = n // step
        blk = widx.reshape(nb, block_rows, LANES)
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, block_rows, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, rows, LANES), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_rows, LANES),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, block_rows, LANES),
                                           jnp.int32),
                    interpret=INTERPRET,
        )(blk, tabR)

    return f


# --------------------------------------- E4: fused screen + scan summaries

INT_INF = 1 << 30  # plain int: jnp constants can't be closure-captured by kernels


def _block_summaries(a, sc):
    """(64,128) int32 scores (0 at unscored) + scored mask -> 4 scalars."""
    Al = jnp.cumsum(a, axis=1)
    rt = Al[:, -1:]                              # (64,1) row totals
    Rex = jnp.cumsum(rt, axis=0) - rt            # exclusive row prefix
    A = Al + Rex                                 # flat cumsum
    P = jnp.where(sc, A, jnp.int32(INT_INF))
    Ml = jax.lax.associative_scan(jnp.minimum, P, axis=1)
    rm = Ml[:, -1:]
    rme = jax.lax.associative_scan(jnp.minimum, rm, axis=0)
    rme = jnp.concatenate([jnp.full((1, 1), INT_INF, jnp.int32),
                           rme[:-1]], axis=0)
    M = jnp.minimum(Ml, rme)
    Bv = A - M
    return A[-1, -1], Bv[-1, -1], jnp.max(A), jnp.max(Bv)


def make_screen_scan(rows, sub_blocks=8, block=8192):
    """aug codes -> per-8192-block (tA, tB, maxA, maxB) int32."""
    BR = sub_blocks * (block // LANES)           # rows per grid step
    R_OUT = max(8, 4 * sub_blocks)               # padded output rows

    def kernel(codes_ref, thr_ref, tab_ref, out_ref):
        aug = codes_ref[0]                       # (BR,128) int32
        sc = ((aug >> 17) & 1) == 1
        c = aug & 0xFFFF
        widx = c >> 3
        lo = widx & (LANES - 1)
        row = widx >> 7
        p = jax.lax.broadcasted_iota(jnp.int32, (BR, LANES), 0) & 7
        sel = (row & ~7) | ((p - row) & 7)
        G = BR // 8
        los = [lo[8 * m:8 * m + 8] for m in range(G)]
        sels = [sel[8 * m:8 * m + 8] for m in range(G)]
        accs = [jnp.zeros((8, LANES), jnp.int32) for _ in range(G)]
        for j in range(rows):
            d, w = j & 7, j >> 3
            win = tab_ref[d, 8 * w:8 * w + 8, :]
            for m in range(G):
                g = jnp.take_along_axis(win, los[m], axis=1)
                accs[m] = jnp.where(sels[m] == j, g, accs[m])
        words = jnp.concatenate(accs, axis=0)
        nib = (words >> ((c & 7) * 4)) & 15
        s = (nib + 1) * 256 + 3 - thr_ref[0, 0]
        a = jnp.where(sc, s, 0)
        br = block // LANES
        for b in range(sub_blocks):
            tA, tB, mA, mB = _block_summaries(
                a[br * b:br * b + br], sc[br * b:br * b + br])
            vals = [tA, tB, mA, mB]
            for q in range(4):
                out_ref[0, q * sub_blocks + b, :] = jnp.full(
                    (LANES,), vals[q], jnp.int32)

    @jax.jit
    def f(tabR, aug, thr_q):
        n = aug.shape[0]
        step = BR * LANES
        nb = n // step
        blk = aug.reshape(nb, BR, LANES)
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
        )(blk, thr_q.reshape(1, 1), tabR)
        # [nb_steps, R_OUT, 128] -> 4 x [n_blocks]
        o = out[:, :4 * sub_blocks, 0].reshape(nb, 4, sub_blocks)
        return (o[:, 0].reshape(-1), o[:, 1].reshape(-1),
                o[:, 2].reshape(-1), o[:, 3].reshape(-1))

    return f


# ----------------------------------------------------------------- driver

def main():
    log(f"devices={jax.devices()} jax={jax.__version__}")
    n = 6144 * 8192  # 50,331,648
    rng = np.random.default_rng(0)
    codes_h = rng.integers(0, 1 << 16, size=n, dtype=np.int32)
    aug_h = codes_h | (3 << 16)  # all valid + scored
    aug = jax.device_put(aug_h)
    sync((aug,))
    log(f"n={n:,} staged")

    nul = jax.jit(lambda x: x[:8] * 2)
    _, t_null = bench("null dispatch", nul, (aug,), n, t_null=0.0)

    # --- E1: MXU ceiling (ns/el where an "element" is one K column)
    REPS, M, K, N = 65536, 512, 4096, 128
    a8 = jax.device_put(rng.integers(0, 2, size=(M, K), dtype=np.int8))
    b8 = jax.device_put(rng.integers(0, 2, size=(K, N), dtype=np.int8))
    nel = REPS * K
    for name, it, at in [
        ("dot i8->i32", jnp.int8, jnp.int32),
        ("dot bf16->f32", jnp.bfloat16, jnp.float32),
    ]:
        aa = a8.astype(it) if it != jnp.int8 else a8
        bb = b8.astype(it) if it != jnp.int8 else b8
        bench(f"E1 {name} {M}x{K}x{N}", make_dot_probe(M, K, N, at, REPS),
              (aa, bb), nel, t_null=t_null)

    # --- E2: count variants
    for tile, hib, c16, a16 in [
        (4096, 9, False, False),   # v0 = round-2 production
        (8192, 9, False, False),
        (16384, 9, False, False),
        (8192, 8, False, False),   # square 256x256
    ]:
        name = f"E2 count T{tile} hi{hib} c16={int(c16)} a16={int(a16)}"
        bench(name, make_count(tile, hib, c16, a16), (aug,), n,
              t_null=t_null)

    # --- E3: gather variants (k=8 packed class table: 8192 words)
    tabw = jnp.asarray(
        rng.integers(-(1 << 31), 1 << 31, size=8192, dtype=np.int64)
        .astype(np.int32))
    tabR = prerolled(tabw)
    widx = jax.device_put((codes_h >> 3).astype(np.int32))
    sync((widx,))
    from kmer_spans_tpu.ops.gather import pallas_word_gather
    bench("E3 g0 fori (prod r2)", lambda t, w: pallas_word_gather(t, w),
          (tabR, widx), n, t_null=t_null)
    for br, stack in [(64, False), (64, True), (256, False), (512, False)]:
        bench(f"E3 unroll BR{br} stack={int(stack)}",
              make_gather_unrolled(64, br, stack), (tabR, widx), n,
              t_null=t_null)

    # --- E4: fused screen+scan
    thr_q = jnp.int32(3071)
    for sb in (1, 4, 8):
        fn = make_screen_scan(64, sub_blocks=sb)
        out, _ = bench(f"E4 screen+scan SB{sb}", fn, (tabR, aug, thr_q), n,
                       t_null=t_null)
    # correctness spot-check vs XLA reference on a small prefix
    try:
        fn = make_screen_scan(64, sub_blocks=8)
        m = 64 * 8192
        outs = fn(tabR, aug[:m], thr_q)
        tA = np.asarray(outs[0])
        words = np.asarray(tabw)[(codes_h[:m] >> 3)]
        nib = (words >> ((codes_h[:m] & 7) * 4)) & 15
        s = (nib + 1) * 256 + 3 - 3071
        ref_tA = s.reshape(-1, 8192).sum(axis=1)
        ok = np.array_equal(tA, ref_tA)
        log(f"E4 correctness tA: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            log(f"  got {tA[:4]} want {ref_tA[:4]}")
    except Exception as e:  # noqa: BLE001
        log(f"E4 correctness FAILED {type(e).__name__}: {e}")

    log("lab done")


if __name__ == "__main__":
    main()
