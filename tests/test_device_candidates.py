"""On-device candidate path parity vs the host path (VERDICT item 2).

The host generate_candidates (whose exactness vs a transcription of the
reference find_msav_m was fuzz-verified in round 1) is the oracle: the
jitted device path must return identical Candidates arrays."""

import numpy as np
import pytest

from swiftortho_tpu.config import SearchConfig
from swiftortho_tpu.constants import AA9, AA20
from swiftortho_tpu.corpus import make_corpus, write_corpus
from swiftortho_tpu.io_fasta import SeqDB
from swiftortho_tpu.ops.index import build_index
from swiftortho_tpu.search.blastp import _mask_queries, blastp_stream
from swiftortho_tpu.search.candidates import generate_candidates
from swiftortho_tpu.search.candidates_device import (
    device_path_supported, generate_candidates_device)


def _assert_same(c_dev, c_host):
    for f in ('qrow', 'subject', 'score', 'band_q', 'band_s'):
        np.testing.assert_array_equal(
            np.asarray(getattr(c_dev, f)), np.asarray(getattr(c_host, f)),
            err_msg=f)


@pytest.fixture(scope='module')
def corpus_db(tmp_path_factory):
    corpus = make_corpus(n_taxa=3, n_families=25, seed=21,
                         min_len=60, max_len=200)
    p = tmp_path_factory.mktemp('devc') / 'c.fsa'
    write_corpus(str(p), corpus)
    return SeqDB.from_path(str(p))


class TestDeviceCandidatesParity:
    @pytest.mark.parametrize('alpha,ssps', [
        ([AA9], '11111111'),
        ([AA20], '1111111'),
        ([AA9, AA20], '11111111'),
        ([AA9], '1101011,111111'),
    ])
    def test_parity_batches(self, corpus_db, alpha, ssps):
        db = corpus_db
        ix = build_index(db, 0, min(40, len(db)), alpha, ssps, 1 << 18)
        for wst in (0, 32):
            idx = np.arange(wst, min(wst + 32, len(db)), dtype=np.int64)
            toks, lens = _mask_queries(db, idx, 256, True)
            host = generate_candidates(toks, lens, db, ix, alpha, ssps)
            dev = generate_candidates_device(toks, lens, db, ix,
                                             alpha, ssps)
            assert len(host.subject) > 0
            _assert_same(dev, host)

    def test_parity_second_chunk(self, corpus_db):
        """Chunk with seq_offset > 0 exercises the locus off-by-one
        decode and global subject ids."""
        db = corpus_db
        ix = build_index(db, 30, 60, [AA9], '11111111', 1 << 18)
        toks, lens = _mask_queries(db, np.arange(16, dtype=np.int64),
                                   256, True)
        host = generate_candidates(toks, lens, db, ix, [AA9], '11111111')
        dev = generate_candidates_device(toks, lens, db, ix,
                                         [AA9], '11111111')
        assert len(host.subject) > 0
        _assert_same(dev, host)

    def test_empty_queries(self, corpus_db):
        db = corpus_db
        ix = build_index(db, 0, 20, [AA9], '11111111', 1 << 18)
        toks = np.full((4, 64), ord('x'), np.uint8)   # fully masked
        lens = np.full(4, 60, np.int64)
        dev = generate_candidates_device(toks, lens, db, ix,
                                         [AA9], '11111111')
        assert len(dev.subject) == 0

    def test_posting_cap_falls_back(self, corpus_db, monkeypatch):
        """Waves whose posting total exceeds the device-memory cap must
        fall back to the host engine (identical results) instead of
        risking a TPU worker crash."""
        monkeypatch.setenv('SWIFTORTHO_DEVICE_CAND_CAP', '1')
        db = corpus_db
        ix = build_index(db, 0, 20, [AA9], '11111111', 1 << 18)
        toks, lens = _mask_queries(db, np.arange(8, dtype=np.int64),
                                   128, True)
        dev = generate_candidates_device(toks, lens, db, ix,
                                         [AA9], '11111111')
        host = generate_candidates(toks, lens, db, ix, [AA9], '11111111')
        assert len(host.subject) > 0
        _assert_same(dev, host)

    def test_unsupported_ranges_fall_back(self, corpus_db):
        db = corpus_db
        ix = build_index(db, 0, 10, [AA9], '11111111', 1 << 18)
        big = np.zeros((1, 1 << 14), np.uint8)        # L > 2^13
        assert not device_path_supported(big, db, ix)
        toks, lens = _mask_queries(db, np.arange(4, dtype=np.int64),
                                   1 << 14, True)
        dev = generate_candidates_device(toks, lens, db, ix,
                                         [AA9], '11111111')
        host = generate_candidates(toks, lens, db, ix, [AA9], '11111111')
        _assert_same(dev, host)


class TestDeviceCandidatesEndToEnd:
    def test_blastp_rows_identical(self, corpus_db, monkeypatch):
        """Full search with the device candidate engine swapped in is
        byte-identical."""
        db = corpus_db
        cfg = SearchConfig(expect=1e-5, nc=262144, chunk=30,
                           query_batch=32)
        base = list(blastp_stream(db, db, cfg))
        monkeypatch.setenv('SWIFTORTHO_CANDIDATES', 'device')
        dev = list(blastp_stream(db, db, cfg))
        assert base and dev == base


class TestChunkedStage2:
    def test_chunked_blocks_identical(self, corpus_db, monkeypatch):
        """A cap that forces several stage-2 row blocks must still give
        results identical to the host engine (and to the unchunked
        device run): chain groups are per-query, so query-row blocking
        never splits a group."""
        db = corpus_db
        ix = build_index(db, 0, 40, [AA9], '11111111', 1 << 18)
        toks, lens = _mask_queries(db, np.arange(24, dtype=np.int64),
                                   256, True)
        host = generate_candidates(toks, lens, db, ix, [AA9], '11111111')
        full = generate_candidates_device(toks, lens, db, ix,
                                          [AA9], '11111111')
        # cap = the largest single query's postings: the greedy
        # partition must produce several blocks, and no query overflows
        # (which would short-circuit to the host engine)
        from swiftortho_tpu.constants import reduced_alphabet_table
        from swiftortho_tpu.ops.seeds import hash_seeds_batch
        from swiftortho_tpu.search.candidates import _self_score_budget
        tbl = reduced_alphabet_table(AA9)
        r, b, p = hash_seeds_batch(toks, lens, tbl, '11111111', ix.nc)
        cnt = ix.bucket_counts(b)
        keep = _self_score_budget(toks, lens, r, p, cnt, ix.mink,
                                  ix.threshold)
        row_tot = np.bincount(r[keep], cnt[keep], minlength=24)
        assert row_tot.sum() > row_tot.max() > 0
        monkeypatch.setenv('SWIFTORTHO_DEVICE_CAND_CAP',
                           str(int(row_tot.max())))
        events = []
        import swiftortho_tpu.search.candidates_device as cd
        import swiftortho_tpu.utils as U
        orig = U.log_event
        monkeypatch.setattr(U, 'log_event',
                            lambda stage, **kw: events.append(stage))
        chunked = generate_candidates_device(toks, lens, db, ix,
                                             [AA9], '11111111')
        assert 'device_candidates_chunked' in events
        assert 'device_candidates_fallback' not in events
        assert len(host.subject) > 0
        _assert_same(full, host)
        _assert_same(chunked, host)
