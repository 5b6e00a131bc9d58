"""Analysis layer: MSA, phylogeny, pan-genome, RBH, operons, utilities."""

import io

import numpy as np
import pytest

from swiftortho_tpu.analysis.misc import (cluster_compare, extract_core,
                                          nr_collapse, nr_expand)
from swiftortho_tpu.analysis.msa import (center_star_msa, global_align,
                                         trim_alignment)
from swiftortho_tpu.analysis.operon import gene_fam_idx, operon_cluster_edges
from swiftortho_tpu.analysis.pan_genome import (build_matrix, pan_report,
                                                rarefaction)
from swiftortho_tpu.analysis.phylo import neighbor_joining, tree_from_alignment
from swiftortho_tpu.analysis.rbh import get_rbh_pairs, rbh2phy
from swiftortho_tpu.io_fasta import SeqDB


class TestGlobalAlign:
    def test_identical(self):
        a, b, s = global_align('MKVLAW', 'MKVLAW')
        assert a == b == 'MKVLAW'

    def test_indel(self):
        a, b, s = global_align('MKVLAW', 'MKVAW')
        assert a.replace('-', '') == 'MKVLAW'
        assert b.replace('-', '') == 'MKVAW'
        assert len(a) == len(b)
        assert b.count('-') == 1

    def test_scores_consistent(self):
        from swiftortho_tpu.constants import B62_BYTES
        a, b, s = global_align('MKVLAWDERT', 'MKVLAWDERT')
        want = sum(int(B62_BYTES[ord(c), ord(c)]) for c in 'MKVLAWDERT')
        assert s == want


class TestMSA:
    def test_three_way(self):
        seqs = ['MKVLAWDERTYH', 'MKVLAWDETYH', 'MKVLAWDERTY']
        aln = center_star_msa(seqs)
        assert len({len(r) for r in aln}) == 1
        for orig, row in zip(seqs, aln):
            assert row.replace('-', '') == orig

    def test_trim(self):
        rows = ['AB-D', 'AB-D', 'ABCD']
        out = trim_alignment(rows, max_gap_frac=0.5)
        assert out == ['ABD', 'ABD', 'ABD']


class TestPhylo:
    def test_nj_topology(self):
        # two close pairs
        names = ['a', 'b', 'c', 'd']
        D = np.array([[0, .1, .8, .8],
                      [.1, 0, .8, .8],
                      [.8, .8, 0, .1],
                      [.8, .8, .1, 0]])
        nwk = neighbor_joining(names, D)
        assert nwk.endswith(';')
        # a,b adjacent and c,d adjacent in the newick
        ab = min(nwk.find('a:'), nwk.find('b:'))
        assert nwk[ab - 1] == '(' or nwk[nwk.find('b:') - 1] == ','

    def test_tree_from_alignment(self):
        names = ['t1', 't2', 't3']
        rows = ['MKVLAW', 'MKVLAW', 'MKVPPW']
        nwk = tree_from_alignment(names, rows)
        for n in names:
            assert n in nwk


class TestPanGenome:
    def _db(self):
        recs = []
        for t in range(4):
            for g in range(3):
                recs.append(('tax%d|g%d' % (t, g), 'MKVLAW'))
        return SeqDB.from_records(recs)

    def test_matrix_and_classes(self):
        db = self._db()
        # g0: core (all 4 taxa); g1: shared (2); g2 of tax0: specific
        clsr = ['\t'.join('tax%d|g0' % t for t in range(4)) + '\n',
                'tax0|g1\ttax1|g1\n']
        taxa, names, types, mat, (spec, shar, core) = build_matrix(db, clsr)
        assert core == 1 and shar == 1
        # unclustered genes become Specific singletons
        assert spec == len(db) - 6
        assert mat.shape == (2 + len(db) - 6, 4)

    def test_rarefaction_deterministic(self):
        mat = (np.arange(40).reshape(8, 5) % 3 == 0).astype(np.int32)
        a = rarefaction(mat, size=5)
        b = rarefaction(mat, size=5)
        assert a == b

    def test_report_structure(self):
        db = self._db()
        clsr = ['\t'.join('tax%d|g0' % t for t in range(4)) + '\n']
        out = io.StringIO()
        pan_report(db, clsr, out)
        text = out.getvalue()
        assert '# Number' in text
        assert '#family\ttype' in text
        assert 'group_000000000\tCore' in text


class TestRBH:
    def _sc(self, q, s, bit):
        return ('%s\t%s\t90\t100\t1\t0\t1\t100\t1\t100\t1e-50\t%f\t100\t100'
                '\t0\t%s\n' % (q, s, float(bit), s))

    def test_reciprocal_pair(self):
        lines = [self._sc('a|1', 'b|1', 200), self._sc('a|1', 'b|2', 100),
                 self._sc('b|1', 'a|1', 200), self._sc('b|2', 'a|1', 90)]
        pairs = list(get_rbh_pairs(lines))
        assert pairs == ['a|1\tb|1\n']

    def test_rbh2phy_concatenation(self):
        recs = [('a|1', 'MKVLAWDERTYH'), ('a|2', 'PPPPPP'),
                ('b|1', 'MKVLAWDETYH'), ('c|1', 'MKVLAWDERTYH')]
        db = SeqDB.from_records(recs)
        lines = []
        for q, s in (('a|1', 'b|1'), ('a|1', 'c|1'), ('b|1', 'a|1'),
                     ('c|1', 'a|1')):
            lines.append(self._sc(q, s, 200))
        out = rbh2phy(lines, db)
        taxa = {t for t, _ in out}
        assert taxa == {'a', 'b', 'c'}
        lens = {len(s) for _, s in out}
        assert len(lens) == 1


class TestOperon:
    def test_edges(self):
        # groups: g1..g4 in cluster rows 1..? (row 0 is dropped by the
        # reference's `if k:` quirk, so put a dummy first row)
        clsr = ['dummy|x\n', 'g1a\tg1b\n', 'g2a\tg2b\n', 'g3a\tg3b\n',
                'g4a\n']
        groups = gene_fam_idx(clsr)
        operons = ['g1a-->g2a-->g3a-->g4a\n', 'g1b<--g2b<--g3b\n']
        edges = list(operon_cluster_edges(operons, groups))
        # operon 0 and 1 share groups {1,2,3} -> edge both ways + self edges
        joined = ''.join(edges)
        assert 'g1a-->g2a-->g3a-->g4a\tg1b<--g2b<--g3b' in joined
        assert 'g1b<--g2b<--g3b\tg1a-->g2a-->g3a-->g4a' in joined

    def test_header_skipped(self):
        groups = {'a': 1, 'b': 2, 'c': 3}
        edges = list(operon_cluster_edges(['gene_id-->x\n', 'a-->b-->c\n'],
                                          groups))
        assert all('gene_id' not in e for e in edges)


class TestMisc:
    def test_nr_roundtrip(self):
        recs = [('t|a desc', 'MKVL'), ('t|b', 'MKVL'), ('t|c', 'PPPP')]
        nr = list(nr_collapse(recs))
        assert nr == [('t|a;;;t|b', 'MKVL'), ('t|c', 'PPPP')]
        sc = 't|a;;;t|b\tt|c\t90\t4\t0\t0\t1\t4\t1\t4\t1e-5\t50\t4\t4\n'
        rows = list(nr_expand([sc]))
        assert len(rows) == 2
        assert rows[0].startswith('t|a\tt|c\t')
        assert rows[1].startswith('t|b\tt|c\t')

    def test_extract_core(self):
        pan = ['# header\n', 'group_0\tCore\t1\t1\n', 'group_1\tShare\t1\t0\n']
        clsr = ['b|1\ta|1\n', 'a|2\tb|2\n']
        recs = [('a|1', 'AAAA'), ('b|1', 'BBBB'), ('a|2', 'CCCC')]
        out = list(extract_core(pan, clsr, recs))
        assert out == [('a|1', 'AAAA')]   # lexicographically first member

    def test_cluster_compare(self):
        q = ['a\tb\n', 'c\td\n']
        r = ['b\ta\n', 'x\ty\n']
        pq, pr = cluster_compare(q, r)
        assert pq == 50.0 and pr == 50.0
