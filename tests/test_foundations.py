"""Foundations: scoring tables, K-A statistics, fasta ingest, seg filter."""

import numpy as np
import pytest

from swiftortho_tpu.constants import (AA9, B62_BYTES, B62_CODES, BYTE2CODE,
                                      reduced_alphabet_table)
from swiftortho_tpu.io_fasta import SeqDB, iter_fasta, write_fasta
from swiftortho_tpu.ops.stats import bit2e, f2s, score2bit
from swiftortho_tpu.ops.seg import seg_batch, seg_batch_np, seg_string

AA = 'ACDEFGHIKLMNPQRSTVWY'


class TestBlosum:
    def test_known_values(self):
        # spot checks against the published BLOSUM62 (same values the
        # reference's dict carries, fsearch.py:330)
        assert B62_BYTES[ord('W'), ord('W')] == 11
        assert B62_BYTES[ord('C'), ord('C')] == 9
        assert B62_BYTES[ord('A'), ord('A')] == 4
        assert B62_BYTES[ord('E'), ord('Q')] == 2
        assert B62_BYTES[ord('G'), ord('I')] == -4
        assert B62_BYTES[ord('X'), ord('X')] == -1
        assert B62_BYTES[ord('B'), ord('N')] == 3
        # default for unknown pairs, incl. '*' (not in the reference dict)
        assert B62_BYTES[ord('*'), ord('*')] == -4
        assert B62_BYTES[ord('J'), ord('A')] == -4

    def test_case_folding_and_symmetry(self):
        assert np.array_equal(B62_BYTES, B62_BYTES.T)
        assert B62_BYTES[ord('a'), ord('w')] == B62_BYTES[ord('A'), ord('W')]

    def test_code_space_consistent(self):
        for a in 'ARNDCQEGHILKMFPSTWYVBZXj*':
            for b in 'ARNDCQEGHILKMFPSTWYVbzx-':
                assert (B62_CODES[BYTE2CODE[ord(a)], BYTE2CODE[ord(b)]]
                        == B62_BYTES[ord(a), ord(b)])

    def test_reduced_alphabet(self):
        tbl = reduced_alphabet_table(AA9)
        # AST group -> min(ord) = ord('A')
        assert tbl[ord('S')] == ord('A') == tbl[ord('T')] == tbl[ord('a')]
        # CFILMVY -> ord('C')
        for c in 'CFILMVYcfilmvy':
            assert tbl[ord(c)] == ord('C')
        # ungrouped bytes map to themselves
        assert tbl[ord('x')] == ord('x')


class TestKAStats:
    def test_score2bit(self):
        # bit = int((0.267*S + 3.1941832)/ln2)
        assert score2bit(100) == int((0.267 * 100 + 3.1941832122778293)
                                     / 0.69314718055994529)
        assert score2bit(0) == 4
        assert score2bit(52, gapped=False) == int(
            (0.309 * 52 + 1.9589953886039688) / 0.69314718055994529)

    def test_bit2e(self):
        e = bit2e(5000, 300, 400, 50)
        assert e == pytest.approx(5000 * 300 * 400 * 2.0 ** -50)

    def test_f2s(self):
        assert f2s(0.0) == '0'
        assert f2s(-1) == '0'
        assert f2s(0.01) == '0.01'
        assert f2s(1.0) == '1.0'
        # truncated-mantissa scientific format below 1e-3
        assert f2s(1.6012e-105) == '1.60e-105'
        # py2 str(float) semantics (12 sig digits): 10**log10(5e-5) lands at
        # 4.9999999999999996, which py2 prints as '5.0' (py3's shortest repr
        # would give '4.999...' and truncate to '4.99' — the reference ran
        # under RPython/py2, so '5.0e-5' is the faithful output)
        assert f2s(5e-5) == '5.0e-5'
        assert f2s(9.999e-10).endswith('e-10')
        # shortest-repr vs 12-digit divergence: py2 prints 3.1, py3 would
        # print 3.0999999999999996 and truncate to 3.09
        from swiftortho_tpu.ops.stats import py2_float_str
        assert py2_float_str(3.0999999999999996) == '3.1'
        assert py2_float_str(3.0) == '3.0'
        assert py2_float_str(1e22) == '1e+22'


class TestFasta:
    def test_roundtrip(self, tmp_path):
        recs = [('tax1|g1 desc here', 'MKVLA'), ('tax2|g2', 'ACDEFGHIKLMNP')]
        p = str(tmp_path / 'x.fsa')
        write_fasta(p, recs)
        db = SeqDB.from_path(p)
        assert len(db) == 2
        assert db.ids == ['tax1|g1', 'tax2|g2']
        assert db.taxa() == ['tax1', 'tax2']
        assert db.seq_str(0) == 'MKVLA'
        assert db.seq_str(1) == 'ACDEFGHIKLMNP'
        assert list(db.lengths) == [5, 13]

    def test_multiline_and_batch(self, tmp_path):
        p = str(tmp_path / 'y.fsa')
        with open(p, 'w') as fh:
            fh.write('>a|1\nMKV\nLA\n>a|2\nGG\n')
        db = SeqDB.from_path(p)
        assert db.seq_str(0) == 'MKVLA'
        batch, lens = db.padded_batch(np.array([0, 1]), 8)
        assert batch.shape == (2, 8)
        assert lens.tolist() == [5, 2]
        assert bytes(batch[0, :5]) == b'MKVLA'
        # suffix gather
        batch, lens = db.padded_batch(np.array([0]), 8, starts=np.array([2]))
        assert bytes(batch[0, :3]) == b'VLA'
        assert lens[0] == 3


class TestSeg:
    def test_low_complexity_masked(self):
        s = 'A' * 40
        e, m = seg_string(s)
        assert e == 'x' * 40
        assert m == 'x' * 40

    def test_random_unmasked(self, rng):
        s = ''.join(AA[i] for i in rng.integers(0, 20, 100))
        e, m = seg_string(s)
        # a random 20-letter sequence should be (almost) untouched
        assert e.count('x') <= 12

    def test_mixed_region(self):
        # note: because the reference's sliding update drifts (see module
        # docstring), only low-complexity regions consistent with the first
        # window's composition get masked — so put the repeat run first.
        right = 'MKVLAWDERTYH' * 4
        s = 'PPPPPPPPPPPPPPPPPPPP' + right
        e, _ = seg_string(s)
        assert e.startswith('xxxxxxxxxxxx')
        assert e.endswith(right[-8:])

    def test_uppercasing(self):
        e, _ = seg_string('mkvlawdertyh')
        assert e == 'MKVLAWDERTYH'

    @pytest.mark.parametrize('case', ['lowc', 'rand', 'mixed', 'short'])
    def test_batch_matches_oracle(self, rng, case):
        B, L = 8, 96
        toks = np.zeros((B, L), dtype=np.uint8)
        lens = np.zeros(B, dtype=np.int32)
        for r in range(B):
            if case == 'short':
                n = int(rng.integers(1, 14))
            else:
                n = int(rng.integers(13, L))
            if case == 'lowc':
                s = ''.join(rng.choice(list('AP'), n))
            elif case == 'rand':
                s = ''.join(AA[i] for i in rng.integers(0, 20, n))
            else:
                k = n // 3
                s = (''.join(AA[i] for i in rng.integers(0, 20, k))
                     + 'Q' * (n - 2 * k)
                     + ''.join(AA[i] for i in rng.integers(0, 20, k)))
            toks[r, :n] = np.frombuffer(s.encode(), dtype=np.uint8)
            lens[r] = n
        want = seg_batch_np(toks, lens)
        got = np.asarray(seg_batch(toks, lens))
        for r in range(B):
            assert bytes(got[r, :lens[r]]) == bytes(want[r, :lens[r]]), \
                f'row {r}: {bytes(toks[r, :lens[r]])}'


class TestSegVec:
    @pytest.mark.parametrize('case', ['lowc', 'rand', 'short'])
    def test_vec_matches_oracle(self, rng, case):
        from swiftortho_tpu.ops.seg import seg_batch_vec
        B, L = 8, 96
        toks = np.zeros((B, L), dtype=np.uint8)
        lens = np.zeros(B, dtype=np.int32)
        for r in range(B):
            n = int(rng.integers(1, 14)) if case == 'short' \
                else int(rng.integers(13, L))
            if case == 'lowc':
                s = ''.join(rng.choice(list('AP'), n))
            else:
                s = ''.join(AA[i] for i in rng.integers(0, 20, n))
            toks[r, :n] = np.frombuffer(s.encode(), dtype=np.uint8)
            lens[r] = n
        want = seg_batch_np(toks, lens)
        got = seg_batch_vec(toks, lens)
        for r in range(B):
            assert bytes(got[r, :lens[r]]) == bytes(want[r, :lens[r]])


class TestSegNative:
    def test_native_matches_oracle_and_numpy(self, rng, monkeypatch):
        """native/seg.cpp must be bit-for-bit the sequential oracle
        (incremental entropy accumulation), and the numpy fallback must
        agree on everything the fuzz set covers."""
        from swiftortho_tpu.ops.seg import seg_batch_vec
        import swiftortho_tpu.native as native
        B, L = 64, 128
        toks = np.zeros((B, L), dtype=np.uint8)
        lens = np.zeros(B, dtype=np.int64)
        for r in range(B):
            n = int(rng.integers(1, L))
            kind = r % 4
            if kind == 0:          # low complexity
                s = ''.join(rng.choice(list('APG'), n))
            elif kind == 1:        # runs
                s = ''.join(rng.choice(list(AA)) * int(rng.integers(1, 20))
                            for _ in range(8))[:n].ljust(n, 'K')
            elif kind == 2:        # lowercase mix
                s = ''.join(c.lower() if rng.random() < .4 else c
                            for c in (AA[i]
                                      for i in rng.integers(0, 20, n)))
            else:
                s = ''.join(AA[i] for i in rng.integers(0, 20, n))
            toks[r, :n] = np.frombuffer(s.encode(), dtype=np.uint8)
            lens[r] = n
        want = seg_batch_np(toks, lens)
        got_native = seg_batch_vec(toks, lens)       # routes to native
        assert (got_native == want).all()

        def boom(*a, **k):
            raise RuntimeError('off')
        monkeypatch.setattr(native, 'seg_batch_native', boom)
        got_np = seg_batch_vec(toks, lens)
        assert (got_np == want).all()
