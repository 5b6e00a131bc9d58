"""Banded SW: vectorized anti-diagonal wavefront vs sequential oracle."""

import numpy as np
import pytest

from swiftortho_tpu.ops.banded_sw import (AlnResult, kswat_oracle,
                                          postprocess_batch, sw_align_batch)

AA = 'ACDEFGHIKLMNPQRSTVWY'


def _mutate(s, rng, sub=0.15, ind=0.05):
    out = []
    for c in s:
        r = rng.random()
        if r < ind / 2:
            continue
        elif r < ind:
            out.append(c)
            out.append(AA[rng.integers(0, 20)])
        elif r < ind + sub:
            out.append(AA[rng.integers(0, 20)])
        else:
            out.append(c)
    return ''.join(out)


def _gen_pairs(rng, n_pairs, max_len=120):
    pairs = []
    for t in range(n_pairs):
        n = int(rng.integers(5, max_len))
        s0 = ''.join(AA[i] for i in rng.integers(0, 20, n))
        kind = t % 4
        if kind == 0:
            s1 = _mutate(s0, rng)
        elif kind == 1:
            s1 = ''.join(AA[i] for i in rng.integers(0, 20,
                                                     int(rng.integers(5, max_len))))
        elif kind == 2:
            s1 = (_mutate(s0[: n // 2], rng)
                  + ''.join(AA[i] for i in rng.integers(0, 20, n // 3)))
        else:
            s1 = _mutate(s0, rng, sub=0.45, ind=0.15)
        qst = int(rng.integers(0, min(len(s0), 8)))
        sst = int(rng.integers(0, min(len(s1), 8)))
        pairs.append((s0, s1, qst, sst))
    return pairs


def _run_batch(pairs, pad=144):
    """Apply the reference swap rule, run the batch kernel, map back."""
    B = len(pairs)
    tok0 = np.zeros((B, pad), np.uint8)
    tok1 = np.zeros((B, pad), np.uint8)
    len0 = np.zeros(B, np.int32)
    len1 = np.zeros(B, np.int32)
    swapped = np.zeros(B, bool)
    qsts = np.zeros(B, np.int64)
    ssts = np.zeros(B, np.int64)
    for r, (s0, s1, qst, sst) in enumerate(pairs):
        # reference swap: columns = strictly shorter suffix (fsearch.py:1364)
        if len(s0) - qst < len(s1) - sst:
            c, w = s0[qst:], s1[sst:]
            swapped[r] = False
        else:
            c, w = s1[sst:], s0[qst:]
            swapped[r] = True
        cb = np.frombuffer(c.encode(), np.uint8)
        wb = np.frombuffer(w.encode(), np.uint8)
        tok0[r, :len(cb)] = cb
        tok1[r, :len(wb)] = wb
        len0[r], len1[r] = len(cb), len(wb)
        qsts[r], ssts[r] = qst, sst
    best = sw_align_batch(tok0, tok1, len0, len1)
    return postprocess_batch(best, qsts, ssts, swapped)


class TestBatchVsOracle:
    def test_identical_sequences(self):
        s = 'MKVLAWDERTYHACDEFGHIKLMNPQRSTVWY'
        res = _run_batch([(s, s, 0, 0)])
        o = kswat_oracle(s, s)
        assert res['aln'][0] == o.aln == len(s)
        assert res['idy'][0] == pytest.approx(100.0)
        assert res['score'][0] == o.raw_score
        assert res['bit'][0] == o.bit

    def test_fuzz_matches_oracle(self, rng):
        pairs = _gen_pairs(rng, 64)
        res = _run_batch(pairs)
        for r, (s0, s1, qst, sst) in enumerate(pairs):
            o = kswat_oracle(s0, s1, qst, sst)
            got = (round(float(res['idy'][r]), 6), int(res['aln'][r]),
                   int(res['mis'][r]), int(res['gap'][r]),
                   int(res['qst'][r]), int(res['qed'][r]),
                   int(res['sst'][r]), int(res['sed'][r]),
                   int(res['bit'][r]))
            want = (round(o.idy, 6), o.aln, o.mis, o.gap,
                    o.qst, o.qed, o.sst, o.sed, o.bit)
            assert got == want, f'pair {r}: {s0[:40]} / {s1[:40]}'

    def test_no_positive_cell(self):
        # all-mismatch pair: reference would divide by zero; we return zeros
        res = _run_batch([('WWWWW', 'PPPPP', 0, 0)])
        assert res['aln'][0] == 0
        assert res['score'][0] == 0

    def test_mixed_lengths_in_batch(self, rng):
        pairs = [('MKVLA', 'MKVLA', 0, 0),
                 ('MKVLAWDERTYH' * 8, 'MKVLAWDERTYH' * 8, 0, 0),
                 ('AC', 'ACD', 0, 0)]
        res = _run_batch(pairs)
        for r, (s0, s1, qst, sst) in enumerate(pairs):
            o = kswat_oracle(s0, s1, qst, sst)
            assert int(res['score'][r]) == o.raw_score
            assert int(res['aln'][r]) == o.aln


class TestChunkDispatch:
    def test_next_chunk_count_is_smallest_ladder_value(self):
        # the ladder {2^k, 3*2^k} that sw_align_auto and
        # DevicePackContext.run pad batches to (compile-cache reuse)
        from swiftortho_tpu.ops.banded_sw import next_chunk_count
        ladder = sorted({1 << k for k in range(14)}
                        | {3 << k for k in range(14)})
        for n in list(range(1, 300)) + [511, 512, 513, 769, 2049, 3072,
                                        3073, 4096]:
            want = min(v for v in ladder if v >= n)
            assert next_chunk_count(n) == want, n

    def test_auto_non_pow2_batch(self, rng):
        # a batch size that is neither a _CHUNK multiple nor a power of
        # two goes through the padding path; results must match the
        # unpadded batch kernel row-for-row
        from swiftortho_tpu.ops.banded_sw import sw_align_auto
        pairs = _gen_pairs(rng, 37)
        res = _run_batch(pairs)
        B, pad = len(pairs), 144
        tok0 = np.zeros((B, pad), np.uint8)
        tok1 = np.zeros((B, pad), np.uint8)
        len0 = np.zeros(B, np.int32)
        len1 = np.zeros(B, np.int32)
        for r, (s0, s1, qst, sst) in enumerate(pairs):
            a, b = s0[qst:], s1[sst:]
            if not len(a) < len(b):
                a, b = b, a
            tok0[r, :len(a)] = np.frombuffer(a.encode(), np.uint8)
            tok1[r, :len(b)] = np.frombuffer(b.encode(), np.uint8)
            len0[r], len1[r] = len(a), len(b)
        got = sw_align_auto(tok0, tok1, len0, len1)
        assert np.array_equal(np.asarray(got['score']), res['score'])
