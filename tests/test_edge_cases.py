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
    def test_batched_tiles_match_oracle(self, rng):
        """_align_long_tiles (one kernel batch for all tiles of a wave)
        vs the sequential kswat_st_long oracle loop (fsearch.py
        :1480-1498) — per-tile results identical, including the
        empty-subject-tile rows past the subject's end."""
        import numpy as np
        from swiftortho_tpu.ops.banded_sw import kswat_oracle
        from swiftortho_tpu.search.blastp import _align_long_tiles

        AA = 'ACDEFGHIKLMNPQRSTVWY'
        mk = lambda n: ''.join(AA[i] for i in rng.integers(0, 20, n))
        base = mk(9000)
        recs = [('t|a', base),                       # 3 tiles vs itself
                ('t|b', base[:5000] + mk(100)),      # shorter homolog
                ('t|c', mk(4200))]                   # subject runs out
        db = SeqDB.from_records(recs)
        pad = 16384
        toks, lens = db.padded_batch(np.arange(3), pad)
        qrow = np.array([0, 0, 0], dtype=np.int64)
        subj = np.array([0, 1, 2], dtype=np.int64)
        bq = np.array([0, 0, 0], dtype=np.int64)
        bs = np.array([0, 0, 0], dtype=np.int64)
        got = _align_long_tiles(toks, lens, db, np.arange(3), qrow, subj,
                                bq, bs, (4096,))
        for p in range(3):
            sqi = toks[0, :lens[0]].tobytes().decode('latin-1')
            sqj = db.seq_str(int(subj[p]))
            want = []
            j = 0
            for i in range(0, len(sqi), 4096):
                o = kswat_oracle(sqi[i:i + 4096], sqj[j:j + 4096])
                want.append((o.idy, o.aln, o.mis, o.gap, o.qst + i,
                             o.qed + i, o.sst + j, o.sed + j, o.bit))
                j += 4096
            have = [(r['idy'], r['aln'], r['mis'], r['gap'], r['qst'],
                     r['qed'], r['sst'], r['sed'], r['bit'])
                    for r in got[p]]
            assert have == want, p

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
