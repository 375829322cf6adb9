"""Host simulation of the integer class screen's candidate-block count.

Replicates bench.py's genome + make_span_pipeline's screen/candidacy math
in pure numpy to answer: at n bases / class_bits / threshold, how many
blocks land in candidate runs (i.e. what must cand_blocks be for the
top-C gather to cover them), and how long are the runs?

BENCH_r03's first attempt overflowed at cand=640 (800 Mb, class_bits=2):
this script sizes the fix without burning TPU time.

Usage: python benchmarks/cand_sim.py [n_bases] [k]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from kmer_spans_tpu.ops.gather import SCREEN_SCALE  # noqa: E402


def make_genome(n, rng):
    nbases = rng.integers(0, 4, size=n, dtype=np.uint8)
    for start in range(1_000_000, n - 5000, 5_000_000):
        nbases[start : start + 3000] = np.tile(np.array([0, 3], np.uint8), 1500)
    for start in range(2_500_000, n - 200, 10_000_000):
        nbases[start : start + 100] = 4
    return nbases


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 200_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    block = 8192
    thr, min_score = 0.75, 20.0
    n = -(-n // block) * block
    rng = np.random.default_rng(0)
    nb8 = make_genome(n, rng)
    b2 = (nb8 & 3).astype(np.uint16)
    valid = nb8 < 4

    codes = np.zeros(n, np.uint16 if k <= 8 else np.uint32)
    kv = valid.copy()
    for j in range(k):
        sh = np.empty_like(b2)
        sh[j:] = b2[: n - j]
        sh[:j] = 0
        codes |= sh.astype(codes.dtype) << np.uint16(2 * j)
        if j:
            vv = np.empty_like(valid)
            vv[j:] = valid[: n - j]
            vv[:j] = False
            kv &= vv
    nxt = np.empty_like(valid)
    nxt[:-1] = valid[1:]
    nxt[-1] = False
    scored = kv & nxt

    counts = np.bincount(codes[kv].astype(np.int64), minlength=1 << (2 * k))
    total = counts.sum()
    order = np.argsort(counts, kind="stable")
    mass = np.zeros(counts.shape[0], np.int64)
    mass[order] = np.concatenate([[0], np.cumsum(counts[order])[:-1]])
    rank32 = mass.astype(np.float32) / np.float32(total)

    thr_q = int(np.floor(np.float32(thr) * SCREEN_SCALE)) - 1
    nblk = n // block
    for class_bits in (2, 4):
        levels = 1 << class_bits
        unit = SCREEN_SCALE // levels
        cls = np.clip((rank32 * levels).astype(np.int32), 0, levels - 1)
        s_tab = (cls + 1) * unit + 3 - thr_q
        s = np.where(scored, s_tab[codes], 0).astype(np.int64).reshape(
            nblk, block)
        A = np.cumsum(s, axis=1)
        P = np.where(scored.reshape(nblk, block), A, 1 << 60)
        M = np.minimum.accumulate(P, axis=1)
        Bv = A - M
        tA = A[:, -1]
        tB = np.where(M[:, -1] >= 1 << 59, -(1 << 62), Bv[:, -1])
        maxA = A.max(axis=1)
        maxB = np.where(Bv.min(axis=1) >= 1 << 59, -(1 << 62),
                        Bv.max(axis=1))
        # exact composition
        CA = np.cumsum(tA)
        CB = CA + np.maximum.accumulate(tB - CA)
        block_last = np.maximum(CA, CB)
        x_in = np.concatenate([[0], block_last[:-1]])
        block_max = np.maximum(x_in + maxA, maxB)
        linked = np.zeros(nblk, bool)
        linked[1:] = block_last[:-1] > 0
        starts = np.nonzero(~linked)[0]
        run_of = np.cumsum(~linked) - 1
        run_max = np.maximum.reduceat(block_max, starts)[run_of]
        cand = run_max >= min_score * SCREEN_SCALE
        n_cand = int(cand.sum())
        run_len = np.diff(np.concatenate([starts, [nblk]]))
        cand_runs = cand[starts]
        print(f"class_bits={class_bits}: n={n:,} blocks={nblk} "
              f"cand_blocks={n_cand} cand_runs={int(cand_runs.sum())} "
              f"max_run={run_len.max()} "
              f"mean_cand_run={run_len[cand_runs].mean() if cand_runs.any() else 0:.1f} "
              f"linked_frac={linked.mean():.3f}")


if __name__ == "__main__":
    main()
