// Sanitizer self-test: exercises every native kernel under ASan/UBSan.
//
// The reference C has known UB hazards (signed shift at k=16,
// int-subtraction comparator — SURVEY §5.2) that this codebase must not
// reproduce; `make sanitize` builds this harness with
// -fsanitize=address,undefined and any violation aborts with a report.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

extern "C" {
int64_t ks_count(const uint8_t*, int64_t, int32_t, int32_t*);
int64_t ks_spans(const uint8_t*, int64_t, int32_t, const double*, double,
                 int64_t, double, int64_t*, int64_t*, double*, int64_t,
                 int64_t*);
void ks_pack(const uint8_t*, int64_t, uint8_t*);
int64_t ks_pack2(const uint8_t*, int64_t, uint32_t*, int32_t*, int32_t*,
                 int64_t);
int64_t ks_pack_fasta_body(const uint8_t*, int64_t, uint8_t*);
int64_t ks_replay_packed(const uint32_t*, const uint8_t*, int64_t, int64_t,
                         int32_t, const double*, double, int64_t, double,
                         int64_t, int64_t*, int64_t*, double*, int64_t);
int64_t ks_count_sparse(const uint8_t*, int64_t, int32_t, int64_t*,
                        int64_t*, int64_t, int64_t*, int32_t);
int64_t ks_count_radix(const uint8_t*, int64_t, int32_t, int32_t*, int32_t);
int64_t ks_rank_chain(const int32_t*, int64_t, double, double*);
}

static uint64_t lcg_state = 42;
static uint8_t lcg_base() {
    lcg_state = lcg_state * 6364136223846793005ull + 1442695040888963407ull;
    return (uint8_t)((lcg_state >> 33) & 3);
}

int main() {
    // pack round trip incl. N and IUPAC bytes
    const char* raw = "ACGTnNWacgt\r\n CG";
    std::vector<uint8_t> packed(strlen(raw));
    ks_pack((const uint8_t*)raw, (int64_t)strlen(raw), packed.data());
    if (packed[0] != 0 || packed[4] != 4 || packed[6] != 3) {
        fprintf(stderr, "pack mismatch\n");
        return 1;
    }
    std::vector<uint8_t> body(strlen(raw));
    int64_t m = ks_pack_fasta_body((const uint8_t*)raw,
                                   (int64_t)strlen(raw), body.data());
    if (m != 13) {  // whitespace stripped
        fprintf(stderr, "fasta body len %lld\n", (long long)m);
        return 1;
    }

    // counting at max supported k (15): no signed-shift UB allowed
    const int64_t n = 200000;
    std::vector<uint8_t> g(n);
    for (int64_t i = 0; i < n; ++i) g[i] = lcg_base();
    for (int64_t i = 50000; i < 50600; ++i) g[i] = (i % 2) ? 3 : 0;  // AG
    for (int64_t i = 100000; i < 100100; ++i) g[i] = 4;  // N gap
    for (int k : {1, 2, 8, 15}) {
        std::vector<int32_t> counts((size_t)1 << (2 * k), 0);
        int64_t words = ks_count(g.data(), n, k, counts.data());
        int64_t expect = (100000 - k + 1) + (n - 100100 - k + 1);
        if (words != expect) {
            fprintf(stderr, "k=%d words %lld != %lld\n", k,
                    (long long)words, (long long)expect);
            return 1;
        }
    }

    // span calling with a weight table favoring the AG island
    int k = 2;
    std::vector<double> w(16, -0.4);
    w[(0 << 2) | 3] = 0.6;  // AG
    w[(3 << 2) | 0] = 0.6;  // GA
    std::vector<int64_t> beg(64), end(64);
    std::vector<double> score(64);
    std::vector<int64_t> sc(16, 0);
    int64_t nr = ks_spans(g.data(), n, k, w.data(), 0.0, 100, 20.0,
                          beg.data(), end.data(), score.data(), 64,
                          sc.data());
    if (nr < 1 || beg[0] < 50000 || end[0] > 50700) {
        fprintf(stderr, "spans: %lld regions beg %lld end %lld\n",
                (long long)nr, (long long)beg[0], (long long)end[0]);
        return 1;
    }
    // packed candidate replay vs ks_spans on the same bases: pack a
    // 4-block stretch (seed code + 2-bit bases, 16/word), replay it —
    // including a capacity<nreg retry and resume<k-1 halo reads — and
    // require coordinate/score agreement with the sequential caller.
    {
        const int32_t rk = 5;
        const int64_t block = 64, rows = 4, n2 = rows * block;
        std::vector<uint8_t> seq(n2 + rk - 1);
        for (auto& b : seq) b = lcg_base();
        for (int64_t i = 20; i < 60; ++i)
            seq[rk - 1 + i] = (i % 2) ? 3 : 0;  // AG island 1
        for (int64_t i = 140; i < 200; ++i)
            seq[rk - 1 + i] = (i % 2) ? 3 : 0;  // AG island 2
        // weights: any kmer of alternating A/G content scores high
        std::vector<double> w2((size_t)1 << (2 * rk), -0.4);
        for (uint32_t c = 0; c < (1u << (2 * rk)); ++c) {
            bool ag = true;
            for (int t = 0; t < rk; ++t) {
                uint32_t b = (c >> (2 * t)) & 3;
                if (b != 0 && b != 3) { ag = false; break; }
            }
            if (ag) w2[c] = 0.6;
        }
        // pack: per row a seed code (rolling code at the row's first
        // position; high bits = the k-1 halo bases) + block/16 base words
        const int64_t wpr = 1 + block / 16;
        std::vector<uint32_t> cw(rows * wpr, 0);
        const uint64_t mask2 = (1ull << (2 * rk)) - 1;
        uint64_t code = 0;
        for (int64_t i = 0; i < n2 + rk - 1; ++i) {
            code = ((code << 2) | seq[i]) & mask2;
            int64_t p = i - (rk - 1);  // stretch position of this last base
            if (p >= 0 && p % block == 0) cw[(p / block) * wpr] = (uint32_t)code;
            if (p >= 0)
                cw[(p / block) * wpr + 1 + ((p % block) >> 4)] |=
                    (uint32_t)seq[i] << (2 * (p % block & 15));
        }
        std::vector<uint8_t> scor(n2, 1);
        std::vector<int64_t> rbeg(64), rend(64);
        std::vector<double> rscore(64);
        // capacity-overflow protocol first: nreg must exceed a cap of 1
        int64_t nr1 = ks_replay_packed(cw.data(), scor.data(), rows, block,
                                       rk, w2.data(), 0.0, 8, 2.0, 0,
                                       rbeg.data(), rend.data(),
                                       rscore.data(), 1);
        int64_t nr2 = ks_replay_packed(cw.data(), scor.data(), rows, block,
                                       rk, w2.data(), 0.0, 8, 2.0, 0,
                                       rbeg.data(), rend.data(),
                                       rscore.data(), 64);
        if (nr1 != nr2 || nr2 < 2) {
            fprintf(stderr, "replay: nr1 %lld nr2 %lld\n",
                    (long long)nr1, (long long)nr2);
            return 1;
        }
        std::vector<int64_t> sbeg(64), send(64);
        std::vector<double> sscore(64);
        int64_t ns = ks_spans(seq.data(), n2 + rk - 1, rk, w2.data(), 0.0,
                              8, 2.0, sbeg.data(), send.data(),
                              sscore.data(), 64, nullptr);
        if (ns != nr2) {
            fprintf(stderr, "replay vs spans: %lld != %lld regions\n",
                    (long long)nr2, (long long)ns);
            return 1;
        }
        for (int64_t r = 0; r < ns; ++r) {
            // stretch coords are offset by the k-1 halo vs sequence coords
            if (rbeg[r] + rk - 1 != sbeg[r] || rend[r] + rk - 1 != send[r]
                || rscore[r] != sscore[r]) {
                fprintf(stderr, "replay region %lld: (%lld,%lld,%f) vs "
                        "(%lld,%lld,%f)\n", (long long)r,
                        (long long)rbeg[r], (long long)rend[r], rscore[r],
                        (long long)sbeg[r], (long long)send[r], sscore[r]);
                return 1;
            }
        }
        printf("replay selftest ok: %lld region(s)\n", (long long)nr2);
    }

    // sparse wide-k counter: dense cross-check at k=8 (every distinct
    // code and count must match ks_count), k=17 totals + repeat counts,
    // and single- vs multi-thread agreement
    {
        std::vector<int32_t> dense((size_t)1 << 16, 0);
        int64_t wd = ks_count(g.data(), n, 8, dense.data());
        std::vector<int64_t> uc(n), un(n);
        int64_t nw = 0;
        int64_t nd = ks_count_sparse(g.data(), n, 8, uc.data(), un.data(),
                                     n, &nw, 3);
        if (nw != wd) {
            fprintf(stderr, "sparse words %lld != %lld\n",
                    (long long)nw, (long long)wd);
            return 1;
        }
        int64_t seen = 0;
        for (int64_t i = 0; i < nd; ++i) {
            if (i && uc[i] <= uc[i - 1]) {
                fprintf(stderr, "sparse codes not ascending\n");
                return 1;
            }
            if (dense[uc[i]] != un[i]) {
                fprintf(stderr, "sparse count mismatch at %lld\n",
                        (long long)uc[i]);
                return 1;
            }
            seen += un[i];
        }
        if (seen != wd) {
            fprintf(stderr, "sparse mass %lld != %lld\n",
                    (long long)seen, (long long)wd);
            return 1;
        }
        // k=17 (wide codes: 34 bits) with 1 and 4 threads byte-identical
        std::vector<int64_t> uc1(n), un1(n), uc4(n), un4(n);
        int64_t nw1 = 0, nw4 = 0;
        int64_t nd1 = ks_count_sparse(g.data(), n, 17, uc1.data(),
                                      un1.data(), n, &nw1, 1);
        int64_t nd4 = ks_count_sparse(g.data(), n, 17, uc4.data(),
                                      un4.data(), n, &nw4, 4);
        if (nd1 != nd4 || nw1 != nw4 ||
            memcmp(uc1.data(), uc4.data(), nd1 * 8) != 0 ||
            memcmp(un1.data(), un4.data(), nd1 * 8) != 0) {
            fprintf(stderr, "sparse k17 thread mismatch\n");
            return 1;
        }
        // the planted AG island must give a repeated 17-mer
        int64_t mx = 0;
        for (int64_t i = 0; i < nd1; ++i) if (un1[i] > mx) mx = un1[i];
        if (mx < 100) {
            fprintf(stderr, "sparse k17 max count %lld\n", (long long)mx);
            return 1;
        }
        printf("sparse selftest ok: k8 %lld distinct, k17 %lld distinct\n",
               (long long)nd, (long long)nd1);
    }

    // cache-staged radix counter == plain counter, k=11, 1 and 3 threads
    // (exercises warm-up overlap at thread seams, bucket flush tails,
    // and the private-table merge)
    {
        std::vector<int32_t> ref((size_t)1 << 22, 0), rad((size_t)1 << 22);
        int64_t wr = ks_count(g.data(), n, 11, ref.data());
        for (int32_t th : {1, 3}) {
            std::fill(rad.begin(), rad.end(), 0);
            int64_t wx = ks_count_radix(g.data(), n, 11, rad.data(), th);
            if (wx != wr || memcmp(ref.data(), rad.data(),
                                   ref.size() * 4) != 0) {
                fprintf(stderr, "radix mismatch threads=%d\n", th);
                return 1;
            }
        }
        printf("radix selftest ok: %lld words\n", (long long)wr);
    }

    // sort-free rank chain == the (count asc, index asc) sequential f64
    // fold, incl. zeros (rank 0), a big value (> VCAP side table), and
    // ties (distinct ranks, index order)
    {
        const int64_t m = 4096;
        std::vector<int32_t> c(m);
        for (int64_t i = 0; i < m; ++i) c[i] = (int32_t)(lcg_state >> 40 & 15),
            lcg_state = lcg_state * 6364136223846793005ull + 1442695040888963407ull;
        c[7] = 0; c[8] = 0; c[100] = 1 << 20;  // zeros + a huge value
        double total = 0;
        for (int64_t i = 0; i < m; ++i) total += c[i];
        std::vector<double> rk(m);
        ks_rank_chain(c.data(), m, total, rk.data());
        // reference fold: stable sort by (count, index), accumulate
        std::vector<int64_t> idx(m);
        for (int64_t i = 0; i < m; ++i) idx[i] = i;
        std::sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
            return c[a] != c[b] ? c[a] < c[b] : a < b; });
        double acc = 0.0;
        for (int64_t j = 0; j < m; ++j) {
            if (rk[idx[j]] != acc) {
                fprintf(stderr, "rank chain mismatch at %lld\n",
                        (long long)j);
                return 1;
            }
            acc += (double)c[idx[j]] / total;
        }
        printf("rank chain selftest ok\n");
    }

    // ks_pack2: 2-bit words + N-run intervals roundtrip, incl. overflow
    {
        const int64_t m = 5000;
        std::vector<uint8_t> nb(m);
        for (int64_t i = 0; i < m; ++i) nb[i] = (uint8_t)(i * 7 % 4);
        for (int64_t i = 100; i < 130; ++i) nb[i] = 4;
        nb[500] = 4; nb[m - 1] = 4; nb[0] = 4;
        std::vector<uint32_t> w((m + 15) / 16);
        std::vector<int32_t> st(8), ln(8);
        int64_t runs = ks_pack2(nb.data(), m, w.data(), st.data(),
                                ln.data(), 8);
        if (runs != 4) {
            fprintf(stderr, "pack2 run count %lld\n", (long long)runs);
            return 1;
        }
        std::vector<uint8_t> back(m, 0);
        for (int64_t i = 0; i < m; ++i)
            back[i] = (uint8_t)((w[i / 16] >> (2 * (i % 16))) & 3);
        for (int64_t r = 0; r < runs; ++r)
            for (int32_t j = 0; j < ln[r]; ++j) back[st[r] + j] = 4;
        for (int64_t i = 0; i < m; ++i)
            if (back[i] != nb[i]) {
                fprintf(stderr, "pack2 roundtrip @%lld\n", (long long)i);
                return 1;
            }
        // capacity overflow: returns the TRUE count, writes only cap
        int64_t ro = ks_pack2(nb.data(), m, w.data(), st.data(),
                              ln.data(), 2);
        if (ro != 4) { fprintf(stderr, "pack2 overflow count\n"); return 1; }
        printf("pack2 selftest ok: %lld runs\n", (long long)runs);
    }

    printf("selftest ok: %lld region(s), scan counts %lld\n",
           (long long)nr,
           (long long)(sc[0] + sc[1] + sc[2] + sc[3]));
    return 0;
}
