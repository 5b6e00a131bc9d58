"""Robustness: degenerate inputs through the full pipeline."""

import numpy as np
import pytest

from swiftortho_tpu.config import ClusterConfig, OrthConfig, SearchConfig
from swiftortho_tpu.cluster.driver import find_cluster_stream
from swiftortho_tpu.io_fasta import SeqDB
from swiftortho_tpu.orth.inference import find_orth_stream
from swiftortho_tpu.search.blastp import blastp_stream

CFG = SearchConfig(nc=1 << 16, query_batch=8)


class TestDegenerateSearch:
    def test_empty_query_set(self):
        q = SeqDB.from_records([])
        r = SeqDB.from_records([('t|a', 'MKVLAWDERTYH')])
        assert list(blastp_stream(q, r, CFG)) == []

    def test_single_sequence_self(self):
        db = SeqDB.from_records([('t|a', 'MKVLAWDERTYHACDEFGHIKLMNP')])
        rows = list(blastp_stream(db, db, CFG))
        assert len(rows) == 1
        assert rows[0].split('\t')[1] == 't|a'

    def test_too_short_for_seed(self):
        # shorter than the 8-residue seed: no seeds, no hits, no crash
        db = SeqDB.from_records([('t|a', 'MKVLA')])
        assert list(blastp_stream(db, db, CFG)) == []

    def test_rare_residues(self):
        # U (selenocysteine) and O score -4 (outside BLOSUM62); must not
        # crash anywhere in the pipeline
        db = SeqDB.from_records([('t|a', 'MKVUOAWDERTYHMKVLAWDERTYH'),
                                 ('u|b', 'MKVUOAWDERTYHMKVLAWDERTYH')])
        rows = list(blastp_stream(db, db, CFG))
        assert len(rows) >= 2

    def test_all_low_complexity(self):
        db = SeqDB.from_records([('t|a', 'A' * 60), ('u|b', 'A' * 60)])
        # fully seg-masked: no seeds survive
        assert list(blastp_stream(db, db, CFG)) == []

    def test_filter_off_finds_low_complexity(self):
        db = SeqDB.from_records([('t|a', 'A' * 60), ('u|b', 'A' * 60)])
        cfg = SearchConfig(nc=1 << 16, query_batch=8, filter_query=False)
        rows = list(blastp_stream(db, db, cfg))
        assert len(rows) >= 2


class TestDegenerateDownstream:
    def test_orth_empty(self):
        assert list(find_orth_stream([], OrthConfig())) == []

    def test_cluster_empty(self):
        assert list(find_cluster_stream([], ClusterConfig())) == []

    def test_cluster_single_edge(self):
        out = list(find_cluster_stream(['a|1\tb|1\t2.0\n'],
                                       ClusterConfig(algorithm='mcl')))
        assert out == ['a|1\tb|1\n']


class TestLongSequences:
    def test_tiled_long_pair_path(self, rng):
        # a >4096-residue pair goes through the 4096-tile path
        # (reference kswat_st_long, fsearch.py:1480-1498)
        base = ''.join('ACDEFGHIKLMNPQRSTVWY'[i]
                       for i in rng.integers(0, 20, 4500))
        db = SeqDB.from_records([('t|long', base), ('u|long', base)])
        cfg = SearchConfig(nc=1 << 18, query_batch=4)
        rows = list(blastp_stream(db, db, cfg))
        # self-hits tile into at least two rows each (4500 = 4096 + tail)
        own = [r for r in rows if r.split('\t')[0] == r.split('\t')[1]]
        assert len(own) >= 4
        for r in rows:
            f = r.split('\t')
            assert int(f[7]) <= 4500 and int(f[9]) <= 4500
