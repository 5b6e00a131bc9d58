"""Orthology inference: classification, reciprocity, weights, quirks."""

import numpy as np
import pytest

from swiftortho_tpu.config import OrthConfig, SearchConfig
from swiftortho_tpu.corpus import make_corpus
from swiftortho_tpu.io_fasta import SeqDB
from swiftortho_tpu.orth.inference import (classify_qipo, find_orth_stream,
                                           parse_sc_rows, _reciprocal)
from swiftortho_tpu.search.blastp import blastp_stream


def _sc(qid, sid, bit, idy=90.0, aln=100, qst=1, qed=100, qln=100, sln=100):
    return ('%s\t%s\t%s\t%d\t5\t0\t%d\t%d\t1\t100\t1e-50\t%f\t%d\t%d\t0\t%s\n'
            % (qid, sid, idy, aln, qst, qed, float(bit), qln, sln, sid))


class TestParse:
    def test_coverage_filter(self):
        rows = [_sc('a|1', 'b|1', 100, qed=100, qln=100),
                _sc('a|1', 'b|2', 100, qed=40, qln=100)]  # cov 0.40 < 0.5
        groups = list(parse_sc_rows(rows, OrthConfig(coverage=0.5)))
        assert len(groups) == 1
        assert [g[1] for g in groups[0]] == ['b|1']

    def test_identity_filter(self):
        rows = [_sc('a|1', 'b|1', 100, idy=30.0)]
        assert list(parse_sc_rows(rows, OrthConfig(identity=50))) == []

    def test_dedup_keeps_max(self):
        rows = [_sc('a|1', 'b|1', 80), _sc('a|1', 'b|1', 120)]
        g = next(parse_sc_rows(rows, OrthConfig()))
        assert len(g) == 1 and g[0][2] == 120.0

    def test_bsr_uses_first_row(self):
        rows = [_sc('a|1', 'a|1', 200), _sc('a|1', 'b|1', 100)]
        g = next(parse_sc_rows(rows, OrthConfig(norm='bsr')))
        assert g[0][2] == pytest.approx(1.0)
        assert g[1][2] == pytest.approx(0.5)


class TestClassify:
    def test_ip_ot_co(self):
        # a|1's hits: self, in-paralog a|2 (score above best inter-taxon),
        # ortholog b|1 (best in taxon b), co-ortholog b|2
        group = [('a|1', 'a|1', 300.0), ('a|1', 'a|2', 250.0),
                 ('a|1', 'b|1', 200.0), ('a|1', 'b|2', 150.0)]
        ips, ots, cos = classify_qipo(group)
        assert ('a|1', 'a|2', 250.0) in ips and ('a|2', 'a|1', 250.0) in ips
        assert ots == [('a|1', 'b|1', 200.0)]
        assert cos == [('a|1', 'b|2', 150.0)]

    def test_self_hit_never_ip(self):
        ips, _, _ = classify_qipo([('a|1', 'a|1', 300.0)])
        assert ips == []

    def test_paralog_below_outmax_dropped(self):
        group = [('a|1', 'a|2', 150.0), ('a|1', 'b|1', 200.0)]
        ips, ots, _ = classify_qipo(group)
        assert ips == []
        assert len(ots) == 1


class TestReciprocal:
    def test_mean_mid_max_tail(self):
        pairs = [('a|1', 'b|1', 100.0), ('a|1', 'b|1', 200.0),
                 ('x|1', 'y|1', 10.0), ('x|1', 'y|1', 30.0)]
        out = _reciprocal(pairs)
        # (a,b) is mid-stream -> mean; (x,y) is the lex-last key -> max
        assert out == [('a|1', 'b|1', 150.0), ('x|1', 'y|1', 30.0)]

    def test_singletons_dropped(self):
        assert _reciprocal([('a|1', 'b|1', 100.0)]) == []


class TestEndToEnd:
    @pytest.fixture(scope='class')
    def orth_lines(self):
        corpus = make_corpus(n_taxa=3, n_families=10, seed=5, dup_prob=0.3)
        db = SeqDB.from_records(corpus.records)
        cfg = SearchConfig(expect=1e-5, nc=1 << 18, query_batch=64)
        sc = list(blastp_stream(db, db, cfg))
        return list(find_orth_stream(sc, OrthConfig(0.5, 0))), corpus

    def test_relations_present(self, orth_lines):
        lines, corpus = orth_lines
        rels = {l.split('\t')[0] for l in lines}
        assert 'OT' in rels
        # corpus has dup_prob=0.3 -> in-paralogs should exist
        assert 'IP' in rels

    def test_ot_pairs_same_family_cross_taxon(self, orth_lines):
        lines, corpus = orth_lines
        for l in lines:
            rel, q, s, w = l.rstrip('\n').split('\t')
            assert q < s or rel != 'OT'
            if rel == 'OT':
                assert corpus.family_of[q] == corpus.family_of[s]
                assert q.split('|')[0] != s.split('|')[0]
            if rel == 'IP':
                assert q.split('|')[0] == s.split('|')[0]
            assert float(w) > 0

    def test_weights_normalized_around_one(self, orth_lines):
        lines, _ = orth_lines
        ws = [float(l.split('\t')[3]) for l in lines
              if l.startswith('OT')]
        assert 0.5 < np.mean(ws) < 1.5


class TestOutOfCore:
    def test_matches_in_memory(self, tmp_path):
        from swiftortho_tpu.orth.outofcore import find_orth_stream_ooc
        corpus = make_corpus(n_taxa=3, n_families=10, seed=5, dup_prob=0.3)
        db = SeqDB.from_records(corpus.records)
        sc = list(blastp_stream(db, db, SearchConfig(expect=1e-5,
                                                     nc=1 << 18,
                                                     query_batch=64)))
        for norm in ('no', 'bsr', 'bal'):
            cfg = OrthConfig(0.5, 0, norm)
            mem = list(find_orth_stream(sc, cfg))
            ooc = list(find_orth_stream_ooc(sc, cfg,
                                            tmpdir=str(tmp_path)))
            assert mem == ooc, norm

    def test_empty_input(self, tmp_path):
        from swiftortho_tpu.orth.outofcore import find_orth_stream_ooc
        assert list(find_orth_stream_ooc([], OrthConfig(),
                                         tmpdir=str(tmp_path))) == []


class TestFastPath:
    """orth/fast.py (native m8 parse + vectorized inference) must be
    BYTE-identical to the streaming oracle (SWIFTORTHO_NATIVE_ORTH=0)
    on every norm mode and quirky input shape."""

    def _both(self, lines, cfg, monkeypatch):
        from swiftortho_tpu.orth import fast
        monkeypatch.setenv('SWIFTORTHO_NATIVE_ORTH', '1')
        ok, it = fast.try_fast(iter(lines), cfg)
        fastout = list(it) if ok else None
        monkeypatch.setenv('SWIFTORTHO_NATIVE_ORTH', '0')
        slow = list(find_orth_stream(iter(lines), cfg))
        return ok, fastout, slow

    def test_real_pipeline_identical_all_norms(self, monkeypatch):
        corpus = make_corpus(n_taxa=4, n_families=12, seed=11,
                             dup_prob=0.3)
        db = SeqDB.from_records(corpus.records)
        sc = list(blastp_stream(db, db, SearchConfig(expect=1e-5,
                                                     nc=1 << 18,
                                                     query_batch=64)))
        for norm in ('no', 'bsr', 'bal'):
            ok, fastout, slow = self._both(sc, OrthConfig(0.5, 0, norm),
                                           monkeypatch)
            assert ok and fastout == slow, norm

    def test_quirk_inputs_identical(self, monkeypatch):
        # duplicate pairs (sam_tax first-pair quirk feeds on repeats),
        # same-score ties, unsorted qid runs, dedup-by-max, self hits
        lines = []
        for rep in range(3):        # triple pair -> NOT reciprocal (==2)
            lines.append(_sc('a|1', 'b|1', 50))
        lines += [_sc('a|1', 'a|2', 70), _sc('a|1', 'a|1', 99),
                  _sc('a|2', 'a|1', 70), _sc('a|2', 'b|2', 44),
                  _sc('b|1', 'a|1', 50), _sc('b|1', 'b|2', 60),
                  _sc('b|2', 'a|2', 44), _sc('b|2', 'b|1', 60),
                  # a|1 reappears: separate run, merged groups quirk
                  _sc('a|1', 'b|2', 33), _sc('x|q', 'y|r', 5),
                  _sc('y|r', 'x|q', 5)]
        for norm in ('no', 'bsr', 'bal'):
            ok, fastout, slow = self._both(lines, OrthConfig(0.1, 0,
                                                             norm),
                                           monkeypatch)
            assert ok and fastout == slow, norm

    def test_short_rows_fall_back(self, monkeypatch):
        # 12-col rows: only the streaming path implements the len_dict
        # cache; try_fast must decline and return a byte-exact replay
        from swiftortho_tpu.orth import fast
        twelve = 'a|1\tb|1\t90.0\t100\t5\t0\t1\t100\t1\t100\t1e-50\t55.0\n'
        lines = [twelve, twelve.replace('b|1', 'b|2')]
        monkeypatch.setenv('SWIFTORTHO_NATIVE_ORTH', '1')
        ok, it = fast.try_fast(iter(lines), OrthConfig(0.1, 0))
        assert not ok
        assert list(it) == lines       # replay preserves bytes
        out = list(find_orth_stream(iter(lines), OrthConfig(0.1, 0)))
        monkeypatch.setenv('SWIFTORTHO_NATIVE_ORTH', '0')
        assert out == list(find_orth_stream(iter(lines),
                                            OrthConfig(0.1, 0)))

    def test_sep_error_raises(self, monkeypatch):
        monkeypatch.setenv('SWIFTORTHO_NATIVE_ORTH', '1')
        lines = [_sc('a|1', 'b|1', 50), _sc('nosep', 'b|1', 50)]
        with pytest.raises(ValueError):
            list(find_orth_stream(iter(lines), OrthConfig(0.1, 0)))

    def test_env_opt_out(self, monkeypatch):
        from swiftortho_tpu.orth import fast
        monkeypatch.setenv('SWIFTORTHO_NATIVE_ORTH', '0')
        lines = [_sc('a|1', 'b|1', 50)]
        ok, it = fast.try_fast(iter(lines), OrthConfig())
        assert not ok and list(it) == lines


class TestNativeOrthFormat:
    """native/orthfmt.cpp: CPython-repr weight column + bulk row
    formatting; find_orth_blocks must concatenate byte-identically to
    find_orth_stream on both the native and fallback branches."""

    def test_repr_fuzz_vs_str(self):
        import random
        import struct
        from swiftortho_tpu.native import py_repr_doubles_native
        rng = random.Random(13)
        vals = [0.0, -0.0, 1.0, -1.0, 0.1, 2.0, 1e15, 1e16, -1e16, 1e-4,
                1e-5, 5e-324, 1.7976931348623157e308, 9.999999999999999e15,
                1234567890123456.0, 123456789012345680.0, 0.5, 1 / 3,
                float('inf'), float('-inf'), float('nan'),
                1.0000000000000002, 1e100, 1e-100, 100.0]
        for _ in range(20000):
            x = struct.unpack(
                '<d', struct.pack('<Q', rng.getrandbits(64)))[0]
            if x == x and abs(x) != float('inf'):
                vals.append(x)
        for _ in range(20000):
            vals.append(rng.uniform(0, 3) / max(rng.uniform(0, 3), 1e-9))
        got = py_repr_doubles_native(vals)
        assert got == [str(v) for v in vals]

    def test_format_rows_matches_python(self):
        from swiftortho_tpu.native import (encode_blob,
                                           format_orth_rows_native)
        names = ['t1|a', 't2|gene_b', 'tax3|x']
        blob, off = encode_blob(names)
        a = np.array([0, 2, 1], np.int64)
        b = np.array([1, 0, 2], np.int64)
        w = np.array([1.5, 1 / 3, 1e-7], np.float64)
        out = format_orth_rows_native('OT', a, b, w, blob, off).decode()
        exp = ''.join('OT\t%s\t%s\t%s\n' % (names[i], names[j], v)
                      for i, j, v in zip(a, b, w.tolist()))
        assert out == exp

    def test_format_rows_bad_index_raises(self):
        from swiftortho_tpu.native import (encode_blob,
                                           format_orth_rows_native)
        blob, off = encode_blob(['t|a'])
        one = np.zeros(1, np.int64)
        with pytest.raises(ValueError):
            format_orth_rows_native('OT', one + 5, one,
                                    np.ones(1), blob, off)

    def test_blocks_identical_to_stream(self, monkeypatch):
        from swiftortho_tpu.orth.inference import find_orth_blocks
        corpus = make_corpus(n_taxa=4, n_families=12, seed=11,
                             dup_prob=0.3)
        db = SeqDB.from_records(corpus.records)
        sc = list(blastp_stream(db, db, SearchConfig(expect=1e-5,
                                                     nc=1 << 18,
                                                     query_batch=64)))
        for norm in ('no', 'bsr', 'bal'):
            cfg = OrthConfig(0.5, 0, norm)
            monkeypatch.setenv('SWIFTORTHO_NATIVE_ORTH', '1')
            lines = ''.join(find_orth_stream(iter(sc), cfg))
            blocks = ''.join(find_orth_blocks(iter(sc), cfg))
            assert blocks and blocks == lines, norm
            # fallback branch: streaming lines joined into blocks
            monkeypatch.setenv('SWIFTORTHO_NATIVE_ORTH', '0')
            assert ''.join(find_orth_blocks(iter(sc), cfg)) == lines, norm

    def test_file_input_matches_list_input(self, tmp_path, monkeypatch):
        # _parse_all's bulk-read branch (file-like) must match the
        # line-iterable branch, including the _ShortRows replay when a
        # 12-col row forces the pure path mid-file
        monkeypatch.setenv('SWIFTORTHO_NATIVE_ORTH', '1')
        full = [_sc('a|%d' % i, 'b|%d' % (i % 7), 50 + i) for i in range(50)]
        twelve = 'a|1\tb|1\t90.0\t100\t5\t0\t1\t100\t1\t100\t1e-50\t55.0\n'
        for lines in (full, full[:20] + [twelve] + full[20:]):
            p = tmp_path / 'in.sc'
            p.write_text(''.join(lines))
            cfg = OrthConfig(0.1, 0)
            with open(p) as fh:
                from_file = list(find_orth_stream(fh, cfg))
            assert from_file == list(find_orth_stream(iter(lines), cfg))
            from swiftortho_tpu.orth.inference import find_orth_blocks
            with open(p) as fh:
                blocks = ''.join(find_orth_blocks(fh, cfg))
            assert blocks == ''.join(from_file)
