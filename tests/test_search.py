"""Search stage: seeding, index, candidates, end-to-end blastp."""

import io

import numpy as np
import pytest

from swiftortho_tpu.config import SearchConfig
from swiftortho_tpu.constants import AA9, AA20, reduced_alphabet_table
from swiftortho_tpu.corpus import make_corpus
from swiftortho_tpu.io_fasta import SeqDB
from swiftortho_tpu.ops.index import build_index, ref_mu_sd
from swiftortho_tpu.ops.seeds import (hash_seeds_batch, hash_seeds_flat,
                                      parse_patterns)
from swiftortho_tpu.search.blastp import blastp_stream
from swiftortho_tpu.search.candidates import generate_candidates


def _db(records):
    return SeqDB.from_records(records)


class TestSeeds:
    def test_patterns(self):
        pats = parse_patterns('1101,111')
        assert pats[0][0] == 4 and list(pats[0][1]) == [0, 1, 3]
        assert pats[1][0] == 3 and list(pats[1][1]) == [0, 1, 2]

    def test_identical_windows_same_bucket(self):
        tbl = reduced_alphabet_table(AA9)
        toks = np.frombuffer(b'MKVLAWDEMKVLAWDE', np.uint8)
        seq_of = np.zeros(16, np.int64)
        b, p = hash_seeds_flat(toks, seq_of, tbl, '11111111', 1 << 20)
        # window at 0 and window at 8 are identical -> same bucket
        d = dict(zip(p.tolist(), b.tolist()))
        assert d[0] == d[8]

    def test_masked_windows_skipped(self):
        tbl = reduced_alphabet_table(AA9)
        toks = np.frombuffer(b'MKVLAWDExKVLAWDE', np.uint8)
        b, p = hash_seeds_flat(toks, np.zeros(16, np.int64), tbl,
                               '11111111', 1 << 20)
        # any window covering position 8 ('x') is dropped
        assert all(pos + 8 <= 8 or pos > 8 for pos in p)
        assert 1 not in p.tolist()

    def test_no_cross_sequence_windows(self):
        tbl = reduced_alphabet_table(AA9)
        toks = np.frombuffer(b'MKVLAWDEMKVLAWDE', np.uint8)
        seq_of = np.repeat(np.array([0, 1], np.int64), 8)
        b, p = hash_seeds_flat(toks, seq_of, tbl, '11111111', 1 << 20)
        assert set(p.tolist()) == {0, 8}

    def test_reduced_alphabet_collision(self):
        # I and V are one aa9 group -> identical buckets
        tbl = reduced_alphabet_table(AA9)
        t1 = np.frombuffer(b'MKILAWDE', np.uint8)
        t2 = np.frombuffer(b'MKVLAWDE', np.uint8)
        z = np.zeros(8, np.int64)
        b1, _ = hash_seeds_flat(t1, z, tbl, '11111111', 1 << 20)
        b2, _ = hash_seeds_flat(t2, z, tbl, '11111111', 1 << 20)
        assert b1.tolist() == b2.tolist()
        # but distinct under aa20
        tbl20 = reduced_alphabet_table(AA20)
        b1, _ = hash_seeds_flat(t1, z, tbl20, '11111111', 1 << 20)
        b2, _ = hash_seeds_flat(t2, z, tbl20, '11111111', 1 << 20)
        assert b1.tolist() != b2.tolist()

    def test_batch_matches_flat(self):
        tbl = reduced_alphabet_table(AA9)
        toks = np.zeros((2, 16), np.uint8)
        toks[0, :12] = np.frombuffer(b'MKVLAWDERTYH', np.uint8)
        toks[1, :10] = np.frombuffer(b'ACDEFGHIKL', np.uint8)
        lens = np.array([12, 10], np.int32)
        r, b, p = hash_seeds_batch(toks, lens, tbl, '11111111', 1 << 20)
        f0, q0 = hash_seeds_flat(toks[0, :12], np.zeros(12, np.int64),
                                 tbl, '11111111', 1 << 20)
        assert sorted(b[r == 0].tolist()) == sorted(f0.tolist())
        # no seeds reaching into padding
        assert (p[r == 1] <= 2).all()


class TestIndex:
    def test_mu_sd_quirk(self):
        # reference divides by n+1 (fsearch.py:746-761)
        c = np.array([0, 4, 4, 4, 0])
        mu, sd = ref_mu_sd(c)
        assert mu == pytest.approx(12 / 4)       # 3 positives, divisor 4
        assert sd == pytest.approx(np.sqrt(3 * 1.0 / 4))

    def test_csr_roundtrip(self):
        db = _db([('t|a', 'MKVLAWDERTYH'), ('t|b', 'MKVLAWDERTYH')])
        ix = build_index(db, 0, 2, [AA9], '11111111', 1 << 16)
        # both sequences produce the same 5 windows; every bucket holds 2
        counts = np.diff(ix.start)
        nz = counts[counts > 0]
        assert (nz == 2).all()
        sid, sst = ix.decode_locus(ix.locus)
        assert set(sid.tolist()) == {0, 1}
        # reference bisect quirk: sequence 1's position-0 seed decodes to
        # (seq 0, pos len(seq0)) — one out-of-range posting per sequence
        assert (sst <= 12 - 8).sum() == len(sst) - 1
        assert sorted(sst[sst > 12 - 8].tolist()) == [12]

    def test_chunk_offsets(self):
        db = _db([('t|a', 'MKVLAWDERTYH'), ('t|b', 'ACDEFGHIKLMNP'),
                  ('t|c', 'MKVLAWDERTYH')])
        ix = build_index(db, 1, 3, [AA9], '11111111', 1 << 16)
        sid, _ = ix.decode_locus(ix.locus)
        assert set(sid.tolist()) == {1, 2}


class TestCandidates:
    def test_self_hit_found(self):
        seq = 'MKVLAWDERTYHACDEFGHIKLMNPQRSTVWYMKVLAWDERTYH'
        db = _db([('t|a', seq), ('t|b', 'PPPPGGGGWWWWHHHHCCCC' * 3)])
        ix = build_index(db, 0, 2, [AA9], '11111111', 1 << 16)
        toks, lens = db.padded_batch(np.array([0]), 64)
        c = generate_candidates(toks, lens, db, ix, [AA9], '11111111')
        assert 0 in c.subject.tolist()
        best = c.score[c.subject == 0][0]
        # self chain should score roughly the full self-score
        assert best > 150
        assert (c.score >= 25).all()

    def test_homolog_ranked_above_noise(self, rng):
        base = ''.join('ACDEFGHIKLMNPQRSTVWY'[i]
                       for i in rng.integers(0, 20, 200))
        # homolog: a few substitutions
        hom = base[:50] + 'A' + base[51:120] + 'G' + base[121:]
        noise = ''.join('ACDEFGHIKLMNPQRSTVWY'[i]
                        for i in rng.integers(0, 20, 200))
        db = _db([('t|h', hom), ('t|n', noise)])
        ix = build_index(db, 0, 2, [AA9], '11111111', 1 << 16)
        qdb = _db([('q|q', base)])
        toks, lens = qdb.padded_batch(np.array([0]), 256)
        c = generate_candidates(toks, lens, db, ix, [AA9], '11111111')
        assert len(c.subject) >= 1
        assert c.subject[0] == 0          # homolog ranked first


class TestBlastpEndToEnd:
    @pytest.fixture(scope='class')
    def corpus_db(self, tmp_path_factory):
        corpus = make_corpus(n_taxa=2, n_families=8, seed=1,
                             min_len=60, max_len=150)
        return SeqDB.from_records(corpus.records), corpus

    def test_all_vs_all(self, corpus_db):
        db, corpus = corpus_db
        cfg = SearchConfig(expect=1e-5, nc=1 << 18, query_batch=64)
        rows = list(blastp_stream(db, db, cfg))
        assert len(rows) > 0
        # parse and sanity-check
        self_hits = 0
        fam_ok = fam_bad = 0
        for row in rows:
            f = row.rstrip('\n').split('\t')
            assert len(f) == 16
            qid, sid = f[0], f[1]
            idy = float(f[2])
            e = float(f[10])
            assert e <= 1e-5
            if qid == sid:
                self_hits += 1
                assert idy == pytest.approx(100.0)
            else:
                if corpus.family_of[qid] == corpus.family_of[sid]:
                    fam_ok += 1
                else:
                    fam_bad += 1
        n = len(db)
        assert self_hits == n                     # every query finds itself
        assert fam_ok > 0                         # orthologs found
        assert fam_bad == 0                       # no cross-family hits at 1e-5

    def test_hit_rows_well_formed(self, corpus_db):
        db, _ = corpus_db
        cfg = SearchConfig(expect=1e-5, nc=1 << 18, query_batch=64)
        row = next(iter(blastp_stream(db, db, cfg)))
        f = row.rstrip('\n').split('\t')
        qid, sid = f[0], f[1]
        aln, mis, gap = int(f[3]), int(f[4]), int(f[5])
        qst, qed, sst, sed = map(int, f[6:10])
        bit = float(f[11])
        qlen, slen, qidx = int(f[12]), int(f[13]), int(f[14])
        assert 1 <= qst <= qed <= qlen
        assert 1 <= sst <= sed <= slen
        assert aln >= qed - qst + 1 - 32
        assert bit > 0
        assert qidx == 0


class TestAlignPairsCatchAll:
    def test_pair_larger_than_max_bucket_is_aligned(self):
        from swiftortho_tpu.io_fasta import SeqDB
        from swiftortho_tpu.search.blastp import _align_pairs
        seq = ('MKVLAWDERTYHGGSPQANILCFMKVLAWDERTYHGGSPQANILCF' * 5)[:200]
        db = SeqDB.from_records([('t|a', seq), ('t|b', seq)])
        toks = np.zeros((1, 256), np.uint8)
        toks[0, :200] = np.frombuffer(seq.encode(), np.uint8)
        lens = np.array([200], np.int64)
        res = _align_pairs(toks, lens, db,
                           np.array([0]), np.array([1]),
                           np.array([0]), np.array([0]), buckets=(64,))
        assert res['score'][0] > 0 and res['aln'][0] >= 200


class TestFusedCandidates:
    """The fused native engine (groupby.cpp candidates_fused) must be
    byte-identical to the staged paths it replaces: expand_group +
    chain_scores + numpy _finish_candidates, and the pure-numpy
    fallback."""

    def _paths(self, toks, lens, db, ix, alphas, ssps, monkeypatch):
        import swiftortho_tpu.native as native

        fused = generate_candidates(toks, lens, db, ix, alphas, ssps)

        def boom(*a, **k):
            raise RuntimeError('off')
        with monkeypatch.context() as m:
            m.setattr(native, 'candidates_fused_native', boom)
            staged = generate_candidates(toks, lens, db, ix, alphas, ssps)
        with monkeypatch.context() as m:
            m.setattr(native, 'candidates_fused_native', boom)
            m.setattr(native, 'expand_group_native', boom)
            m.setattr(native, 'chain_scores_native', boom)
            numpy_fb = generate_candidates(toks, lens, db, ix, alphas,
                                           ssps)
        return fused, staged, numpy_fb

    def test_identical_to_staged_and_numpy(self, monkeypatch,
                                           tmp_path_factory):
        corpus = make_corpus(n_taxa=3, n_families=20, seed=7,
                             min_len=100, max_len=250)
        from swiftortho_tpu.io_fasta import write_fasta
        p = tmp_path_factory.mktemp('fused') / 'c.fsa'
        write_fasta(str(p), corpus.records)
        db = SeqDB.from_path(str(p))
        ix = build_index(db, 0, len(db), [AA9], '11111111', 1 << 16)
        toks, lens = db.padded_batch(np.arange(len(db)), 512)
        from swiftortho_tpu.ops.seg import seg_batch_vec
        toks = seg_batch_vec(toks, lens)
        fused, staged, numpy_fb = self._paths(
            toks, lens, db, ix, [AA9], '11111111', monkeypatch)
        assert len(fused.qrow) > 0
        for f in ('qrow', 'subject', 'score', 'band_q', 'band_s'):
            assert (getattr(fused, f) == getattr(staged, f)).all(), f
            assert (getattr(fused, f) == getattr(numpy_fb, f)).all(), f

    def test_multi_alphabet_multi_pattern(self, monkeypatch,
                                          tmp_path_factory):
        """aa9/aa20 double alphabet + two spaced-seed patterns: the
        fused engine must stay identical to the staged-native and numpy
        paths through the cross-pattern dedup and fold tie-breaks."""
        corpus = make_corpus(n_taxa=2, n_families=12, seed=19,
                             min_len=80, max_len=200)
        from swiftortho_tpu.io_fasta import write_fasta
        p = tmp_path_factory.mktemp('fusedm') / 'c.fsa'
        write_fasta(str(p), corpus.records)
        db = SeqDB.from_path(str(p))
        alphas = [AA9, AA20]
        ssps = '1111111,110101011'
        ix = build_index(db, 0, len(db), alphas, ssps, 1 << 16)
        toks, lens = db.padded_batch(np.arange(len(db)), 256)
        from swiftortho_tpu.ops.seg import seg_batch_vec
        toks = seg_batch_vec(toks, lens)
        fused, staged, numpy_fb = self._paths(
            toks, lens, db, ix, alphas, ssps, monkeypatch)
        assert len(fused.qrow) > 0
        for f in ('qrow', 'subject', 'score', 'band_q', 'band_s'):
            assert (getattr(fused, f) == getattr(staged, f)).all(), f
            assert (getattr(fused, f) == getattr(numpy_fb, f)).all(), f

    def test_empty_queries(self, monkeypatch):
        # queries with no seeds (all low-complexity) exercise the
        # zero-candidate path of every engine
        db = _db([('t|a', 'MKVLAWDERTYHACDEFGHIKLMNPQRSTVWY')])
        ix = build_index(db, 0, 1, [AA9], '11111111', 1 << 16)
        qdb = _db([('q|x', 'AAAAAAAAAAAAAAAAAAAAAAAAAAAA')])
        toks, lens = qdb.padded_batch(np.array([0]), 64)
        from swiftortho_tpu.ops.seg import seg_batch_vec
        toks = seg_batch_vec(toks, lens)
        fused, staged, numpy_fb = self._paths(
            toks, lens, db, ix, [AA9], '11111111', monkeypatch)
        assert len(fused.qrow) == len(staged.qrow) == len(numpy_fb.qrow)


class TestWaveSeeds:
    """Chunk-invariant wave precomputes (candidates.WaveSeeds): reusing
    the hashed seeds + budget order across chunk indexes must change
    nothing, and the native budget_keep must equal the numpy block."""

    def test_reuse_across_chunks_identical(self, tmp_path_factory):
        from swiftortho_tpu.search.candidates import make_wave_seeds
        corpus = make_corpus(n_taxa=3, n_families=25, seed=11,
                             min_len=100, max_len=250)
        from swiftortho_tpu.io_fasta import write_fasta
        p = tmp_path_factory.mktemp('ws') / 'c.fsa'
        write_fasta(str(p), corpus.records)
        db = SeqDB.from_path(str(p))
        half = len(db) // 2
        ix0 = build_index(db, 0, half, [AA9], '11111111', 1 << 16)
        ix1 = build_index(db, half, len(db), [AA9], '11111111', 1 << 16)
        toks, lens = db.padded_batch(np.arange(len(db)), 512)
        from swiftortho_tpu.ops.seg import seg_batch_vec
        toks = seg_batch_vec(toks, lens)
        ws = make_wave_seeds(toks, lens, [AA9], '11111111', ix0.nc,
                             ix0.mink)
        for ix in (ix0, ix1):
            plain = generate_candidates(toks, lens, db, ix, [AA9],
                                        '11111111')
            cached = generate_candidates(toks, lens, db, ix, [AA9],
                                         '11111111', wave_seeds=ws)
            assert len(plain.qrow) > 0
            for f in ('qrow', 'subject', 'score', 'band_q', 'band_s'):
                assert (getattr(plain, f) == getattr(cached, f)).all(), f

    def test_mismatched_context_recomputes(self, tmp_path_factory):
        # a context built for a different nc must be ignored, not used
        from swiftortho_tpu.search.candidates import make_wave_seeds
        db = _db([('t|a', 'MKVLAWDERTYHACDEFGHIKLMNPQRSTVWY' * 3)])
        ix = build_index(db, 0, 1, [AA9], '11111111', 1 << 16)
        toks, lens = db.padded_batch(np.array([0]), 128)
        from swiftortho_tpu.ops.seg import seg_batch_vec
        toks = seg_batch_vec(toks, lens)
        ws_bad = make_wave_seeds(toks, lens, [AA9], '11111111',
                                 (1 << 16) - 1, ix.mink)
        assert not ws_bad.matches(ix)
        a = generate_candidates(toks, lens, db, ix, [AA9], '11111111')
        b = generate_candidates(toks, lens, db, ix, [AA9], '11111111',
                                wave_seeds=ws_bad)
        for f in ('qrow', 'subject', 'score', 'band_q', 'band_s'):
            assert (getattr(a, f) == getattr(b, f)).all(), f

    def test_budget_keep_native_matches_numpy(self, monkeypatch, rng):
        import swiftortho_tpu.native as native
        from swiftortho_tpu.search.candidates import (_self_score_budget,
                                                      budget_order)
        B, L, mink = 29, 128, 8
        toks = rng.integers(65, 90, size=(B, L)).astype(np.uint8)
        lens = rng.integers(mink, L + 1, size=B).astype(np.int64)
        nwin = L - mink + 1
        n = 4000
        rows = rng.integers(0, B, n).astype(np.int64)
        qst = np.array([rng.integers(0, max(1, lens[r] - mink + 1))
                        for r in rows], dtype=np.int64)
        counts = rng.integers(0, 40, n).astype(np.int64)
        order = budget_order(toks, mink)
        assert order.shape == (B, nwin)
        kn = _self_score_budget(toks, lens, rows, qst, counts, mink, 35,
                                order=order)

        def boom(*a, **k):
            raise RuntimeError('off')
        with monkeypatch.context() as m:
            m.setattr(native, 'budget_keep_native', boom)
            kf = _self_score_budget(toks, lens, rows, qst, counts, mink,
                                    35, order=order)
        assert np.array_equal(kn, kf)
        assert 0 < kn.sum() < n


class TestRankCutNative:
    def test_matches_numpy_ordering(self, rng):
        """groupby.cpp rank_cut must reproduce the wave ranking exactly:
        (qrow asc, chain score desc, subject asc, input order), vmax
        cut, and pre-cut per-query hit counts."""
        from swiftortho_tpu.native import rank_cut_native
        n, nq, vmax = 20000, 128, 13
        qrow = rng.integers(0, nq, n)
        subj = rng.integers(0, 500, n)
        csc = rng.integers(25, 45, n)          # dense ties
        bq = rng.integers(0, 64, n)
        bs = rng.integers(0, 64, n)
        key = ((qrow.astype(np.uint64) << 47)
               | ((np.uint64((1 << 26) - 1) - csc.astype(np.uint64)) << 21)
               | subj.astype(np.uint64))
        order = np.argsort(key, kind='stable')
        q2, s2, c2, b2, B2 = (a[order] for a in (qrow, subj, csc, bq, bs))
        new_q = np.ones(n, dtype=bool)
        new_q[1:] = q2[1:] != q2[:-1]
        rank = np.arange(n) - np.maximum.accumulate(
            np.where(new_q, np.arange(n), 0))
        nh = np.zeros(nq, np.int64)
        np.add.at(nh, q2, 1)
        cut = rank < vmax
        want = (q2[cut], s2[cut], c2[cut], b2[cut], B2[cut], rank[cut], nh)
        got = rank_cut_native(qrow, subj, csc, bq, bs, nq, vmax)
        for g, w in zip(got, want):
            assert (g == w).all()
