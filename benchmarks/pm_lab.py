#!/usr/bin/env python
"""Ablation lab: where does the pm screen's device time go? (v5e)

Times cumulative stages of ops/pmscreen.py at k=12 (packed) and k=15
(smallv) so the 16.7 ns/el measured by pm_probe decomposes into
primitives we can price against CLAUDE.md's measured floors
(sort 3.2, run lengths 1.3, hist 0.5).  Also A/B's the uint32 packed
key against the sign-bias int32 trick (u32 ^ 0x80000000 sorted as i32).

Run: python benchmarks/pm_lab.py > logs/pm_lab.log 2>&1
Env: PML_BASES (default 100663296), PML_K (default 12)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.sortscreen_probe import make_genome  # noqa: E402


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from kmer_spans_tpu.ops.blocked import blocked_codes
    from kmer_spans_tpu.ops.pmscreen import (
        _extract_list,
        _pm_packed,
        _pm_smallv,
        pm_params,
        pm_sort_screen,
    )
    from kmer_spans_tpu.ops.sortscreen import _run_lengths

    n = int(os.environ.get("PML_BASES", 100_663_296))
    k = int(os.environ.get("PML_K", 12))
    block = 8192
    n = -(-n // block) * block
    log(f"devices={jax.devices()} n={n:,} k={k}")
    nbases = make_genome(n, np.random.default_rng(0))
    dev = jax.device_put(nbases)
    float(jax.device_get(dev[:1])[0])

    size = 1 << (2 * k)
    _, t_list, stride, nbins, cap = pm_params(k, n=n)

    def stage(name, fn_body):
        f = jax.jit(fn_body)
        t0 = time.time()
        o = f(dev)
        jax.tree_util.tree_map(
            lambda x: float(jax.device_get(x.ravel()[0])), o)
        t_c = time.time() - t0
        ts = []
        for _ in range(2):
            t0 = time.time()
            o = None
            for _ in range(2):
                o = f(dev)
            jax.tree_util.tree_map(
                lambda x: float(jax.device_get(x.ravel()[0])), o)
            ts.append((time.time() - t0) / 2)
        t = min(ts)
        log(f"{name:28s} {t:.3f}s  {t/n*1e9:6.2f} ns/el  (compile {t_c:.0f}s)")
        return t

    def codes_of(nb_arr):
        b2 = (nb_arr & 3).reshape(-1, block)
        v2 = (nb_arr < 4).reshape(-1, block)
        codes, kv = blocked_codes(b2, v2, k)
        return codes.reshape(-1), kv.reshape(-1)

    def key_of(nb_arr):
        codes, kv = codes_of(nb_arr)
        return jnp.where(kv, codes, size), kv

    i32 = jnp.int32

    def s_sort1(nb_arr):
        key, kv = key_of(nb_arr)
        pos = jax.lax.iota(i32, n)
        skey, spos = jax.lax.sort((key, pos), num_keys=1)
        return skey[::1024], spos[::1024]

    def s_runs(nb_arr):
        key, kv = key_of(nb_arr)
        pos = jax.lax.iota(i32, n)
        skey, spos = jax.lax.sort((key, pos), num_keys=1)
        head = jnp.concatenate(
            [jnp.ones((1,), bool), skey[1:] != skey[:-1]])
        v = _run_lengths(head, n)
        return v[::1024], spos[::1024]

    def s_hist(nb_arr):
        from kmer_spans_tpu.ops.pallas_kernels import pallas_histogram

        key, kv = key_of(nb_arr)
        pos = jax.lax.iota(i32, n)
        skey, spos = jax.lax.sort((key, pos), num_keys=1)
        head = jnp.concatenate(
            [jnp.ones((1,), bool), skey[1:] != skey[:-1]])
        v = _run_lengths(head, n)
        real = skey < size
        vh = pallas_histogram(jnp.minimum(v, nbins - 1), head & real,
                              nbins)
        return vh, spos[::1024]

    def s_sort2_u32(nb_arr):
        key, kv = key_of(nb_arr)
        pos = jax.lax.iota(i32, n)
        skey, spos = jax.lax.sort((key, pos), num_keys=1)
        head = jnp.concatenate(
            [jnp.ones((1,), bool), skey[1:] != skey[:-1]])
        v = _run_lengths(head, n)
        real = skey < size
        pm_s, spos_s = _pm_packed(skey, spos, v, real, k, n)
        return pm_s[::1024], spos_s[::1024]

    def s_sort2_bias(nb_arr):
        key, kv = key_of(nb_arr)
        pos = jax.lax.iota(i32, n)
        skey, spos = jax.lax.sort((key, pos), num_keys=1)
        head = jnp.concatenate(
            [jnp.ones((1,), bool), skey[1:] != skey[:-1]])
        v = _run_lengths(head, n)
        real = skey < size
        b = 32 - 2 * k
        vclip = (1 << b) - 1
        vcl = jnp.minimum(v, vclip).astype(jnp.uint32)
        pkey = (vcl << (2 * k)) | skey.astype(jnp.uint32)
        pkey = jnp.where(real, pkey, jnp.uint32(0xFFFFFFFF))
        pki = jax.lax.bitcast_convert_type(
            pkey ^ jnp.uint32(0x80000000), i32)
        pk2, spos2 = jax.lax.sort((pki, spos), num_keys=1)
        head2 = jnp.concatenate(
            [jnp.ones((1,), bool), pk2[1:] != pk2[:-1]])
        idx = jax.lax.iota(i32, n)
        start2 = jax.lax.cummax(jnp.where(head2, idx, 0))
        return start2[::1024], spos2[::1024]

    def s_full(nb_arr):
        # return a slice of EVERY output family or XLA dead-codes the
        # list extraction (the round-5 lab's first run did exactly that)
        codes, kv = codes_of(nb_arr)
        scr = pm_sort_screen(codes, kv, k)
        return (scr["pm"][::1024], scr["total"], scr["vh"][:8],
                scr["list_codes"][:8], scr["list_count"])

    if k <= 14:
        stage("sort1", s_sort1)
        stage("sort1+runs", s_runs)
        stage("sort1+runs+hist", s_hist)
        stage("...+sort2(u32)+pm", s_sort2_u32)
        stage("...+sort2(bias i32)+pm", s_sort2_bias)
        stage("full pm_sort_screen", s_full)
    else:
        def s_smallv(nb_arr):
            key, kv = key_of(nb_arr)
            pos = jax.lax.iota(i32, n)
            skey, spos = jax.lax.sort((key, pos), num_keys=1)
            head = jnp.concatenate(
                [jnp.ones((1,), bool), skey[1:] != skey[:-1]])
            v = _run_lengths(head, n)
            real = skey < size
            pm_s = _pm_smallv(v, head, real, t_list)
            return pm_s[::1024], spos[::1024]

        def s_extract(nb_arr):
            key, kv = key_of(nb_arr)
            pos = jax.lax.iota(i32, n)
            skey, spos = jax.lax.sort((key, pos), num_keys=1)
            head = jnp.concatenate(
                [jnp.ones((1,), bool), skey[1:] != skey[:-1]])
            v = _run_lengths(head, n)
            real = skey < size
            (lc,), lv, cnt = _extract_list(
                (skey,), v, head, real, t_list, stride, cap)
            return lc, cnt

        stage("sort1", s_sort1)
        stage("sort1+runs", s_runs)
        stage("sort1+runs+hist", s_hist)
        stage("...+smallv cumsums", s_smallv)
        stage("...+extract list", s_extract)
        stage("full pm_sort_screen", s_full)
    log("lab done")


if __name__ == "__main__":
    main()
