"""On-device index build (ops/index_device.py): bit-for-bit parity with
the host counting-sort build (VERDICT r2 item 5; reference hot loop
lib/fsearch.py:2240-2266)."""

import numpy as np
import pytest

from swiftortho_tpu.config import SearchConfig
from swiftortho_tpu.corpus import make_corpus, write_corpus
from swiftortho_tpu.io_fasta import SeqDB
from swiftortho_tpu.ops.index import build_index
from swiftortho_tpu.ops.index_device import build_index_device


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp('dix')
    fsa = str(p / 'c.fsa')
    write_corpus(fsa, make_corpus(n_taxa=3, n_families=30, seed=9,
                                  min_len=40, max_len=180))
    return SeqDB.from_path(fsa)


def _assert_same(a, b):
    np.testing.assert_array_equal(a.start, b.start)
    np.testing.assert_array_equal(a.locus, b.locus)
    np.testing.assert_array_equal(a.soas, b.soas)
    np.testing.assert_array_equal(a.sid, b.sid)
    np.testing.assert_array_equal(a.sst, b.sst)
    assert (a.nc, a.seq_offset, a.threshold, a.mink) == \
        (b.nc, b.seq_offset, b.threshold, b.mink)


class TestDeviceIndexParity:
    def test_single_pattern(self, corpus):
        host = build_index(corpus, 0, len(corpus), ['aa9'], '11111111',
                           262144)
        dev = build_index_device(corpus, 0, len(corpus), ['aa9'],
                                 '11111111', 262144)
        _assert_same(host, dev)

    def test_multi_alphabet_multi_pattern(self, corpus):
        # multiple alphabets x patterns exercises the cross-pattern
        # dedup and the alphabet-major ordering
        args = (['aa9', 'aa20'], '1110101,11011', 65536)
        host = build_index(corpus, 0, len(corpus), *args)
        dev = build_index_device(corpus, 0, len(corpus), *args)
        _assert_same(host, dev)

    def test_chunk_ranges_and_step(self, corpus):
        # mid-corpus chunk (seq_offset != 0) with a window stride
        n = len(corpus)
        host = build_index(corpus, n // 3, 2 * n // 3, ['aa9'],
                           '111111', 32768, step=3)
        dev = build_index_device(corpus, n // 3, 2 * n // 3, ['aa9'],
                                 '111111', 32768, step=3)
        _assert_same(host, dev)

    def test_masked_residues(self, tmp_path):
        # seg-masked x/X residues invalidate covering windows
        fsa = str(tmp_path / 'x.fsa')
        with open(fsa, 'w') as fh:
            fh.write('>t|a\nMKVLAWDERTYHxxxxXXACDEFGHIKLMNPQRSTVWY\n'
                     '>t|b\nACDxFGHIKLMNPQRSTVWYACDEFGHIK\n')
        db = SeqDB.from_path(fsa)
        host = build_index(db, 0, 2, ['aa9'], '11011', 4096)
        dev = build_index_device(db, 0, 2, ['aa9'], '11011', 4096)
        _assert_same(host, dev)

    def test_search_end_to_end_identical(self, corpus, monkeypatch):
        from swiftortho_tpu.search.blastp import blastp_stream
        cfg = SearchConfig(expect=1e-5, nc=262144, chunk=17,
                           query_batch=32)
        host_rows = list(blastp_stream(corpus, corpus, cfg))
        assert host_rows
        monkeypatch.setenv('SWIFTORTHO_INDEX', 'device')
        dev_rows = list(blastp_stream(corpus, corpus, cfg))
        assert dev_rows == host_rows
