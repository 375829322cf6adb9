// Sanitizer self-test: exercises every native kernel under ASan/UBSan.
//
// The reference C has known UB hazards (signed shift at k=16,
// int-subtraction comparator — SURVEY §5.2) that this codebase must not
// reproduce; `make sanitize` builds this harness with
// -fsanitize=address,undefined and any violation aborts with a report.

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
int64_t ks_pack_fasta_body(const uint8_t*, int64_t, uint8_t*);
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
    printf("selftest ok: %lld region(s), scan counts %lld\n",
           (long long)nr,
           (long long)(sc[0] + sc[1] + sc[2] + sc[3]));
    return 0;
}
