"""Streaming span pipeline: genomes of any size through fixed-shape chunks.

Two compiled programs (shapes fixed => exactly two XLA compiles per (k,
chunk) config, however large the genome):

  * count_chunk(nbases)                  -> partial spectrum (device accum)
  * scan_chunk(nbases, mass, carry, ...) -> block summaries + candidate
                                            gather + chunk transform

The scan state crosses chunk boundaries by max-plus transform composition
(S_next = max(S_in + A, B)); the first k-1 positions of each chunk see the
previous chunk's tail bases via an explicit halo argument, and the scored
rule's lookahead byte rides in the same way — a chunk boundary is neither
an N gap nor a genome end.

Host-side, spans are extracted per chunk from the candidate blocks
(spans/extract.py exact replay); excursions that straddle a boundary are
stitched from each chunk's pulled tail/head blocks.  If a straddling
excursion extends beyond the pulled margin the pipeline reports it in
``unresolved`` rather than guessing (callers rerun those windows through
the exact api path).

Reference parity: this is the TPU-native replacement for processing a
48 Mb scaffold in one sequential C call (test.R:128-140) — SURVEY §5.7.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class StreamResult:
    regions: list  # (seq_id, beg, end, score) global 1-based coords
    n_kmers: int
    unresolved: list  # (chunk_idx, reason) windows needing exact rerun
    counts_device: object  # device array, 4^k (pull lazily if needed)


class StreamingSpanPipeline:
    """count -> rank -> scan over fixed-size chunks with exact stitching."""

    def __init__(
        self,
        k: int,
        chunk_bases: int = 1 << 25,
        block: int = 8192,
        cand_blocks: int = 128,
        margin_blocks: int = 16,
    ):
        import jax
        import jax.numpy as jnp

        from ..ops.blocked import (
            blocked_codes,
            blocked_scan_prefixes,
            blocked_scored,
        )
        from .pipeline import _rank_mass
        from ..spans.pipeline import _seg_max_combine
        from ..ops.scan import _combine

        if chunk_bases % block:
            raise ValueError("chunk_bases must be a multiple of block")
        self.k = k
        self.block = block
        self.chunk = chunk_bases
        self.cand = cand_blocks
        self.margin = margin_blocks
        nb = chunk_bases // block
        size = 1 << (2 * k)
        h = k - 1

        @jax.jit
        def count_chunk(nbases, acc, halo_b, halo_v):
            b2 = (nbases & 3).reshape(nb, block)
            v2 = (nbases < 4).reshape(nb, block)
            codes, kv = blocked_codes(
                b2, v2, k, first_bases=halo_b, first_valid=halo_v
            )
            codes = jnp.where(kv, codes, 0)
            return acc.at[codes].add(kv.astype(jnp.int32))

        @jax.jit
        def rank(acc):
            return _rank_mass(acc), jnp.sum(acc)

        @jax.jit
        def scan_chunk(nbases, mass, total32, thr, cA_in, cB_in,
                       halo_b, halo_v, next_v):
            b2 = (nbases & 3).reshape(nb, block)
            v2 = (nbases < 4).reshape(nb, block)
            codes, kv = blocked_codes(
                b2, v2, k, first_bases=halo_b, first_valid=halo_v
            )
            scored = blocked_scored(v2, kv, next_valid=next_v)
            codes = jnp.where(kv, codes, 0)
            pm = mass[codes]
            s = (pm.astype(jnp.float32) - thr * total32) / total32
            FA, FB, (tA, tB) = blocked_scan_prefixes(s, scored)
            S = jnp.maximum(cA_in + FA, jnp.maximum(cB_in + FA, FB))
            # NOTE: incoming state x = max(cA_in, cB_in) applied to (FA,FB):
            # S = max(x + FA, FB); written as above because x >= 0 always
            # (it IS a score), so max(cA_in, cB_in) + FA == max(cA_in+FA,
            # cB_in+FA).
            block_max = S.reshape(nb, block).max(axis=1)
            block_last = S.reshape(nb, block)[:, -1]
            linked = jnp.concatenate(
                [jnp.zeros((1,), bool), block_last[:-1] > 0])
            fwd, _ = jax.lax.associative_scan(
                _seg_max_combine, (block_max, (~linked).astype(jnp.float32)))
            linked_next = jnp.concatenate([linked[1:], jnp.zeros((1,), bool)])
            bwd, _ = jax.lax.associative_scan(
                _seg_max_combine,
                (jnp.flip(block_max),
                 jnp.flip((~linked_next).astype(jnp.float32))))
            run_max = jnp.maximum(fwd, jnp.flip(bwd))
            top_need, top_idx = jax.lax.top_k(run_max, min(self.cand, nb))
            top_idx = jnp.sort(top_idx)
            # compose the outgoing carry: in ∘ chunk transform
            cA_out = cA_in + tA
            cB_out = jnp.maximum(cB_in + tA, tB)
            m = self.margin
            return {
                "block_last": block_last,
                "run_max": run_max,
                "top_idx": top_idx,
                "pm": pm[top_idx],
                "scored": scored[top_idx],
                "pm_head": pm[:m],
                "scored_head": scored[:m],
                "pm_tail": pm[-m:],
                "scored_tail": scored[-m:],
                "cA": cA_out,
                "cB": cB_out,
                "tail_b": nbases[-h:] if h else jnp.zeros((0,), nbases.dtype),
            }

        self._count = count_chunk
        self._rank = rank
        self._scan = scan_chunk
        self._size = size
        self._nb = nb
        self._jnp = jnp

    def run(self, chunk_iter_factory, thr, min_width, min_score,
            seq_id: int = 0, checkpoint_path: str | None = None,
            resume: bool = False, metrics=None,
            stop_after_chunk: int | None = None) -> StreamResult:
        """Run the two-pass pipeline.

        chunk_iter_factory: zero-arg callable returning an iterator of
        uint8 numpy arrays (nbases; N encoded as 4), each exactly
        chunk_bases long except the last (which is padded with N here).
        The factory is called twice (count pass, scan pass).

        checkpoint_path: if set, the scan pass saves a StreamCheckpoint
        after every chunk; with resume=True and an existing checkpoint,
        the scan pass restarts after the last completed chunk (SURVEY
        §5.3: chunk-granularity elastic recovery).
        metrics: optional utils.metrics.Metrics recorder.
        """
        import jax
        import jax.numpy as jnp

        from ..spans.extract import extract_spans

        k, block, nb = self.k, self.block, self._nb
        h = k - 1

        import contextlib

        def _phase(name, bases=0, **kw):
            if metrics is None:
                return contextlib.nullcontext()
            return metrics.phase(name, bases=bases, **kw)

        with _phase("count"):
            acc = self.accumulate_counts(chunk_iter_factory)
        with _phase("rank"):
            mass, total_i = self.finish_rank(acc)
        return self.scan_stream(
            chunk_iter_factory, mass, total_i, thr, min_width, min_score,
            seq_id=seq_id, checkpoint_path=checkpoint_path, resume=resume,
            metrics=metrics, stop_after_chunk=stop_after_chunk,
            counts_device=acc,
        )

    def accumulate_counts(self, chunk_iter_factory, acc=None):
        """Count pass over one stream; pass ``acc`` to accumulate multiple
        streams into one spectrum (the reference counts across ALL
        sequences before scanning any — src/kmer_spans.c:592-601)."""
        import jax.numpy as jnp

        h = self.k - 1
        if acc is None:
            acc = jnp.zeros(self._size, jnp.int32)
        prev_tail = np.full(h, 4, np.uint8)  # N: stream start has no halo
        for arr in chunk_iter_factory():
            arr = self._pad(arr)
            acc = self._count(
                jnp.asarray(arr), acc,
                jnp.asarray(prev_tail & 3), jnp.asarray(prev_tail < 4),
            )
            if h:
                prev_tail = arr[-h:]
        return acc

    def finish_rank(self, acc, host_threshold: int = 1 << 26):
        """Rank mass from the accumulated spectrum.

        For spectra up to ``host_threshold`` entries the exact integer mass
        is computed on the HOST (pull counts, numpy stable argsort, push) —
        XLA's sort compiles pathologically slowly on some TPU toolchains
        regardless of size, and a 4^12 table is a 67 MB round trip at most.
        Larger spectra use the on-device sort.
        """
        import jax.numpy as jnp

        if self._size <= host_threshold:
            from ..stats.ranks import cumulative_mass

            counts = np.asarray(acc)
            mass = cumulative_mass(counts)
            if mass.max(initial=0) > np.iinfo(np.int32).max:
                raise OverflowError(
                    "rank mass exceeds int32; use the sharded int64 path")
            return jnp.asarray(mass.astype(np.int32)), int(counts.sum())
        mass, total = self._rank(acc)
        return mass, int(total)

    def scan_stream(self, chunk_iter_factory, mass, total_i, thr,
                    min_width, min_score, seq_id=0, checkpoint_path=None,
                    resume=False, metrics=None, stop_after_chunk=None,
                    counts_device=None) -> StreamResult:
        """Scan pass over one stream with a (possibly shared) rank table."""
        import time as _time

        import jax.numpy as jnp

        k, block, nb = self.k, self.block, self._nb
        h = k - 1
        total32 = jnp.float32(total_i)

        regions: list = []
        unresolved: list = []
        cA = jnp.float32(0.0)
        cB = jnp.float32(-np.inf)
        halo_b = jnp.zeros((h,), jnp.uint8)
        halo_v = jnp.zeros((h,), bool)
        thr32 = jnp.float32(thr)

        # host-side stitching state: open excursion s-values at boundary
        open_s: np.ndarray | None = None
        open_scored: np.ndarray | None = None
        open_start: int = 0  # global 0-based position of open_s[0]
        start_chunk = 0

        if checkpoint_path and resume and os.path.exists(checkpoint_path):
            from ..io.checkpoint import StreamCheckpoint

            ck = StreamCheckpoint.load(checkpoint_path)
            start_chunk = ck.chunk_idx + 1
            cA = jnp.float32(ck.cA)
            cB = jnp.float32(ck.cB)
            tail = np.frombuffer(ck.halo_bytes, dtype=np.uint8)
            if h:
                halo_b = jnp.asarray(tail & 3)
                halo_v = jnp.asarray(tail < 4)
            open_s, open_scored = ck.open_s, ck.open_scored
            open_start = ck.open_start
            regions = list(ck.regions)

        chunks = list(chunk_iter_factory())
        base = 0
        for ci, raw in enumerate(chunks):
            arr = self._pad(raw)
            if ci < start_chunk:
                base += arr.shape[0]
                continue
            if stop_after_chunk is not None and ci > stop_after_chunk:
                break  # simulated interruption (scan resumes via checkpoint)
            dev = jnp.asarray(arr)
            is_last = ci == len(chunks) - 1
            next_v = jnp.asarray(
                False if is_last else chunks[ci + 1][0] != 4)
            t0 = _time.perf_counter()
            out = self._scan(dev, mass, total32, thr32, cA, cB,
                             halo_b, halo_v, next_v)
            cA, cB = out["cA"], out["cB"]
            halo_b = out["tail_b"] & 3
            halo_v = (out["tail_b"] < 4)

            res, open_next = self._finish_chunk(
                out, base, thr, total_i, min_width, min_score, seq_id,
                open_s, open_scored, open_start, unresolved, ci,
            )
            regions.extend(res)
            open_s, open_scored, open_start = open_next
            base += arr.shape[0]
            if metrics is not None:
                metrics.record(
                    "scan_chunk", _time.perf_counter() - t0,
                    bases=arr.shape[0], chunk=ci, regions=len(regions),
                )
            if checkpoint_path:
                from ..io.checkpoint import StreamCheckpoint

                tail_np = np.asarray(out["tail_b"]) if h else np.zeros(
                    0, np.uint8)
                StreamCheckpoint(
                    chunk_idx=ci,
                    cA=float(np.asarray(cA)),
                    cB=float(np.asarray(cB)),
                    halo_bytes=(
                        arr[-h:].tobytes() if h else b""
                    ),
                    open_start=open_start,
                    open_s=open_s,
                    open_scored=open_scored,
                    regions=regions,
                ).save(checkpoint_path)

        # genome end: resolve any open excursion (terminal semantics were
        # already applied inside the final chunk because next_v=False)
        return StreamResult(
            regions=regions, n_kmers=total_i, unresolved=unresolved,
            counts_device=counts_device,
        )

    def _pad(self, arr: np.ndarray) -> np.ndarray:
        n = arr.shape[0]
        if n == self.chunk:
            return arr
        if n > self.chunk:
            raise ValueError("chunk longer than configured chunk_bases")
        out = np.full(self.chunk, 4, np.uint8)
        out[:n] = arr
        return out

    def _finish_chunk(self, out, base, thr, total, min_width, min_score,
                      seq_id, open_s, open_scored, open_start,
                      unresolved, ci):
        """Extract this chunk's spans + stitch the boundary excursion.

        Ownership protocol (prevents double emission):
          * the BOUNDARY replay owns the whole excursion that straddles the
            incoming chunk edge — all its regions on both sides — up to its
            exact end E;
          * the IN-CHUNK pass owns (E, next_open_start): candidate stretch
            positions outside that window are masked unscored;
          * the excursion open at the OUTGOING edge (start found from the
            device block_last chain) is handed to the next chunk.
        """
        from ..spans.extract import _first_nonpositive, extract_spans

        block, nb, m = self.block, self._nb, self.margin
        run_max = np.asarray(out["run_max"])
        last = np.asarray(out["block_last"])
        top_idx = np.asarray(out["top_idx"])
        pm_c = np.asarray(out["pm"])
        sc_c = np.asarray(out["scored"])
        margin = 1e-3 * (1.0 + abs(min_score))
        cand = run_max >= (min_score - margin)
        have = np.zeros(nb, bool)
        have[top_idx] = True
        pos_in_pull = {int(b): i for i, b in enumerate(top_idx)}

        def s_of(pm_rows, sc_rows):
            pmf = np.asarray(pm_rows).reshape(-1).astype(np.float64)
            scf = np.asarray(sc_rows).reshape(-1)
            return np.where(scf, pmf / total - thr, 0.0), scf

        regions = []

        # --- A. outgoing open excursion (start located via block_last) ---
        open_next = (None, None, 0)
        clip_from_global = None  # in-chunk pass must not extract past this
        if last[-1] > 0:
            nonpos = np.nonzero(last <= 0)[0]
            b0 = (int(nonpos[-1]) + 1) if nonpos.size else 0
            if b0 < nb - m:
                unresolved.append((ci, "open excursion exceeds tail margin"))
            else:
                tail_s, tail_sc = s_of(out["pm_tail"], out["scored_tail"])
                rel0 = (b0 - (nb - m)) * block  # chain start within margin
                # screen from the chain start (true S there is 0)
                seg = tail_s[rel0:]
                P = np.cumsum(seg)
                Mn = np.minimum.accumulate(np.minimum(P, 0.0))
                S = P - Mn
                zero = np.nonzero(S <= 0)[0]
                start_rel = rel0 + (int(zero[-1]) + 1 if zero.size else 0)
                if start_rel >= tail_s.shape[0]:
                    # S>0 at the edge but no s>0 start inside? clamp
                    start_rel = tail_s.shape[0] - 1
                open_next = (
                    tail_s[start_rel:],
                    tail_sc[start_rel:],
                    base + (nb - m) * block + start_rel,
                )
                clip_from_global = open_next[2]

        # --- B. incoming boundary excursion: owned here entirely ----------
        boundary_done_global = base - 1  # in-chunk pass starts after this
        if open_s is not None:
            head_s, head_sc = s_of(out["pm_head"], out["scored_head"])
            joined_s = np.concatenate([open_s, head_s])
            joined_sc = np.concatenate([open_scored, head_sc])
            vals, z = _first_nonpositive(joined_s, 0)
            if z is None:
                unresolved.append(
                    (ci, "boundary excursion exceeds head margin"))
                boundary_done_global = base + m * block  # best effort
            else:
                clip = z + 1
                regs = extract_spans(joined_s[:clip], joined_sc[:clip],
                                     min_width, min_score, seq_id=seq_id)
                regions.extend(
                    (sid, open_start + beg, open_start + end, sc)
                    for sid, beg, end, sc in regs
                )
                boundary_done_global = open_start + z

        # --- C. in-chunk candidate extraction with ownership masking ------
        if cand.any():
            if (cand & ~have).any():
                unresolved.append((ci, "candidate capacity overflow"))
            else:
                i = 0
                while i < nb:
                    if not cand[i]:
                        i += 1
                        continue
                    j = i
                    while j + 1 < nb and cand[j + 1]:
                        j += 1
                    rows = [pos_in_pull[b] for b in range(i, j + 1)]
                    s_flat, sc_flat = s_of(pm_c[rows], sc_c[rows])
                    bp = base + i * block  # global pos of s_flat[0]
                    gpos = bp + np.arange(s_flat.shape[0])
                    mask = gpos <= boundary_done_global
                    if clip_from_global is not None:
                        mask |= gpos >= clip_from_global
                    sc_flat = sc_flat & ~mask
                    regs = extract_spans(s_flat, sc_flat, min_width,
                                         min_score, seq_id=seq_id)
                    regions.extend(
                        (sid, beg + bp, end + bp, sc)
                        for sid, beg, end, sc in regs
                    )
                    i = j + 1
        return regions, open_next
