// m8 hit-table block parser for the vectorized orth fast path
// (orth/fast.py).  Mirrors the row handling of reference
// bin/find_orth.py blastparse (:158-234) as reimplemented in
// orth/inference.parse_sc_rows:
//   - a row is a '\n'-terminated line, fields split on '\t' (the final
//     line of a block may omit the '\n');
//   - rows with fewer than 12 fields are skipped silently;
//   - on a >=12-field row, qid (f0) and sid (f1) must contain the
//     taxon separator byte or the parse aborts with that row's index
//     (the Python wrapper raises ValueError like parse_sc_rows);
//   - float fields f2 (idy), f3 (aln), f6 (qst), f7 (qed), f11 (score)
//     and, when >13 fields, f12 (qln): any parse failure skips the row;
//   - rows with 12-13 fields are reported (rc 2) so the caller can fall
//     back to the pure-Python path, which owns the reference's
//     first-seen query-length cache for short rows (inference.py:69-73).
//
// Float parsing deviations from CPython float(), named: PEP-515
// underscore grouping is rejected, and hex-float forms are rejected
// (strtod would accept them); both are unobservable on real m8 tables
// and the pure-Python path remains available (SWIFTORTHO_NATIVE_ORTH=0).
//
// Names are interned in first-seen order across the block; the caller
// merges block-local ids into its global table.

#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct SV {
    const char* p;
    size_t n;
    bool operator==(const SV& o) const {
        return n == o.n && std::memcmp(p, o.p, n) == 0;
    }
};
struct SVHash {
    size_t operator()(const SV& s) const {
        // FNV-1a
        uint64_t h = 1469598103934665603ULL;
        for (size_t i = 0; i < s.n; i++) {
            h ^= (unsigned char)s.p[i];
            h *= 1099511628211ULL;
        }
        return (size_t)h;
    }
};

static bool py_float(const char* b, const char* e, double* out) {
    while (b < e && std::isspace((unsigned char)*b)) b++;
    while (e > b && std::isspace((unsigned char)e[-1])) e--;
    if (b == e) return false;
    for (const char* c = b; c < e; c++)
        if (*c == '_' || *c == 'x' || *c == 'X') return false;
    // in-place strtod: after the trim, e points at a '\t'/'\n'/end-of-
    // buffer sentinel (the wrapper appends '\n'), none of which can be
    // part of a number, so strtod stops exactly at or before e; a full
    // parse must consume precisely [b, e)
    char* endp = nullptr;
    double v = std::strtod(b, &endp);
    if (endp != e) return false;
    *out = v;
    return true;
}

}  // namespace

extern "C" {

// Returns 0 ok; 1 = sep-missing id (first offending valid row's line
// start offset in *o_badoff); 2 = a 12/13-field row seen (caller must
// fall back).  Output arrays are caller-allocated with capacity =
// number of '\n' in the block + 1.
//   o_q, o_s      int64[cap]   block-local interned ids per valid row
//   o_f           double[cap*6] idy, aln, qst, qed, score, qln
//   o_nrows       int64[1]
//   o_nameoff     int64[cap*2+1] byte offsets of interned names into
//                 the BLOCK text (start0, end0, start1, end1, ...)
//   o_nnames      int64[1]
int m8parse_block(const char* text, int64_t len, uint8_t sep,
                  int64_t* o_q, int64_t* o_s, double* o_f,
                  int64_t* o_nrows, int64_t* o_nameoff,
                  int64_t* o_nnames, int64_t* o_badoff) {
    std::unordered_map<SV, int64_t, SVHash> intern;
    intern.reserve(1 << 16);
    int64_t nrows = 0, nnames = 0;
    const char* base = text;
    const char* end = text + len;
    const char* line = text;
    const int NEED = 13;  // field starts tracked: f0..f12
    const char* fs[NEED + 1];
    while (line < end) {
        const char* nl = (const char*)std::memchr(line, '\n',
                                                  (size_t)(end - line));
        const char* le = nl ? nl : end;
        // split on '\t' (rstrip('\n') semantics: le excludes the '\n')
        int nf = 0;
        fs[0] = line;
        const char* c = line;
        while (c < le && nf < NEED) {
            const char* t = (const char*)std::memchr(c, '\t',
                                                     (size_t)(le - c));
            if (!t) break;
            nf++;
            fs[nf] = t + 1;
            c = t + 1;
        }
        // nf+1 fields located so far; count remaining tabs for the
        // 12-field minimum / 13-field ("len(f) > 13") decisions
        int extra = 0;
        for (const char* t = c; t < le; t++)
            if (*t == '\t') extra++;
        const int nfields = nf + 1 + (nf == NEED ? extra : 0);
        line = nl ? nl + 1 : end;
        if (nfields < 12) continue;
        // field k spans [fs[k], end of field)
        auto fend = [&](int k) -> const char* {
            if (k < nf) return fs[k + 1] - 1;
            // k == nf: up to next tab or line end
            const char* t = (const char*)std::memchr(
                fs[k], '\t', (size_t)(le - fs[k]));
            return t ? t : le;
        };
        const char* q0 = fs[0];
        const char* q1 = fend(0);
        const char* s0 = fs[1];
        const char* s1 = fend(1);
        if (!std::memchr(q0, sep, (size_t)(q1 - q0))
            || !std::memchr(s0, sep, (size_t)(s1 - s0))) {
            *o_badoff = (int64_t)(q0 - base);
            return 1;
        }
        if (nfields < 14) return 2;  // python path owns len_dict rows
        double idy, aln, qst, qed, sco, qln;
        if (!py_float(fs[2], fend(2), &idy)) continue;
        if (!py_float(fs[3], fend(3), &aln)) continue;
        if (!py_float(fs[6], fend(6), &qst)) continue;
        if (!py_float(fs[7], fend(7), &qed)) continue;
        if (!py_float(fs[11], fend(11), &sco)) continue;
        if (!py_float(fs[12], fend(12), &qln)) continue;
        auto get_id = [&](const char* b, const char* e2) -> int64_t {
            SV key{b, (size_t)(e2 - b)};
            auto it = intern.find(key);
            if (it != intern.end()) return it->second;
            int64_t id = nnames++;
            intern.emplace(key, id);
            o_nameoff[id * 2] = (int64_t)(b - base);
            o_nameoff[id * 2 + 1] = (int64_t)(e2 - base);
            return id;
        };
        o_q[nrows] = get_id(q0, q1);
        o_s[nrows] = get_id(s0, s1);
        double* f = o_f + nrows * 6;
        f[0] = idy; f[1] = aln; f[2] = qst; f[3] = qed; f[4] = sco;
        f[5] = qln;
        nrows++;
    }
    *o_nrows = nrows;
    *o_nnames = nnames;
    return 0;
}

}  // extern "C"

extern "C" {

// Sequential (left-fold) segmented sum: o_sum[i] = 0.0 + v[starts[i]]
// + ... in index order.  numpy's reduce/reduceat use pairwise
// summation, which changes low bits vs the reference's dict `+=`
// accumulation; this preserves the exact fold order.
void seg_sum_seq(const double* v, const int64_t* starts, int64_t nseg,
                 int64_t n, double* o_sum) {
    for (int64_t i = 0; i < nseg; i++) {
        const int64_t en = (i + 1 < nseg) ? starts[i + 1] : n;
        double a = 0.0;
        for (int64_t j = starts[i]; j < en; j++) a += v[j];
        o_sum[i] = a;
    }
}

}  // extern "C"
