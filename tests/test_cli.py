"""CLI entry points, driven as real subprocesses (CPU backend)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from swiftortho_tpu.corpus import make_corpus, write_corpus

ENV = dict(os.environ, JAX_PLATFORMS='cpu', SWIFTORTHO_PLATFORM='cpu',
           PYTHONPATH=os.path.dirname(os.path.dirname(
               os.path.abspath(__file__))))


def _run(args, **kw):
    return subprocess.run([sys.executable, '-m'] + args, env=ENV,
                          capture_output=True, text=True, timeout=300, **kw)


@pytest.fixture(scope='module')
def corpus_file(tmp_path_factory):
    p = tmp_path_factory.mktemp('cli')
    fsa = str(p / 'c.fsa')
    write_corpus(fsa, make_corpus(n_taxa=2, n_families=6, seed=2,
                                  min_len=60, max_len=120))
    return fsa


class TestCliPipeline:
    def test_three_stages(self, corpus_file, tmp_path):
        sc = str(tmp_path / 'out.sc')
        r = _run(['swiftortho_tpu.cli.find_hit', '-p', 'blastp',
                  '-i', corpus_file, '-d', corpus_file, '-o', sc,
                  '-e', '1e-5', '-M', '262144'])
        assert r.returncode == 0, r.stderr[-800:]
        rows = open(sc).read().splitlines()
        assert rows
        # m8 contract: 16 cols; col 11 is '%f'-formatted bit; col 10 f2s E
        f = rows[0].split('\t')
        assert len(f) == 16
        assert '.' in f[11] and float(f[11]) > 0
        assert f[2].count('.') <= 1
        assert int(f[14]) == 0

        r = _run(['swiftortho_tpu.cli.find_orth', '-i', sc, '-c', '0.5',
                  '-y', '0'])
        assert r.returncode == 0, r.stderr[-800:]
        orth = str(tmp_path / 'out.orth')
        open(orth, 'w').write(r.stdout)
        assert all(l.split('\t')[0] in ('IP', 'OT', 'CO')
                   for l in r.stdout.splitlines())

        r = _run(['swiftortho_tpu.cli.find_cluster', '-i', orth,
                  '-a', 'mcl'])
        assert r.returncode == 0, r.stderr[-800:]
        assert r.stdout.strip()

    def test_usage_errors(self):
        r = _run(['swiftortho_tpu.cli.find_hit'])
        assert r.returncode == 1
        assert 'Usage' in r.stdout
        r = _run(['swiftortho_tpu.cli.find_orth'])
        assert r.returncode == 1
        r = _run(['swiftortho_tpu.cli.scripts', 'nonsense'])
        assert r.returncode == 1

    def test_pan_goterm_missing_obo_fetch_fails_clearly(self, tmp_path):
        # reference auto-fetch surface (pan_goterm.py:62-66): a missing
        # go.obo triggers a download attempt; in this zero-egress env
        # that must fail FAST with an actionable message, not a
        # FileNotFoundError traceback (urlopen patched out so the test
        # never touches the network even where egress exists)
        annot = tmp_path / 'a.txt'
        annot.write_text('g1\tGO:0000001\n')
        typ = tmp_path / 't.txt'
        typ.write_text('1\tcore\tg1\n')
        code = (
            "import sys, urllib.request\n"
            "def boom(*a, **k): raise OSError('no egress')\n"
            "urllib.request.urlopen = boom\n"
            "from swiftortho_tpu.cli.scripts import main\n"
            "sys.exit(main(['pan_goterm', '-i', %r, '-t', %r,"
            " '-o', %r]))\n"
            % (str(annot), str(typ), str(tmp_path / 'go.obo')))
        r = subprocess.run([sys.executable, '-c', code], env=ENV,
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 1
        assert 'download failed' in r.stderr
        assert not (tmp_path / 'go.obo').exists()

    def test_joined_flag_form(self, corpus_file, tmp_path):
        # reference accepts '-kvalue' (no space)
        sc = str(tmp_path / 'j.sc')
        r = _run(['swiftortho_tpu.cli.find_hit', '-pblastp',
                  '-i' + corpus_file, '-d' + corpus_file, '-o' + sc,
                  '-M262144'])
        assert r.returncode == 0, r.stderr[-800:]
        assert open(sc).read()


class TestRunAll:
    def test_full_pipeline(self, corpus_file, tmp_path):
        # end-to-end run_all incl. the post-cluster stages (pan-genome,
        # RBH tree); regression: a fleet-branch local SeqDB import once
        # shadowed the module-level name and broke stage 4 for every
        # single-process run (UnboundLocalError)
        import shutil
        fas = str(tmp_path / 'ra.fsa')
        shutil.copy(corpus_file, fas)
        r = _run(['swiftortho_tpu.cli.run_all', '-i', fas,
                  '-A', 'mcl', '-M', '262144', '-y', '0'])
        assert r.returncode == 0, (r.stderr[-800:], r.stdout[-400:])
        res = fas + '_results'
        for suffix in ('.sc', '.opc', '.clsr', '.pan', '.nwk'):
            p = os.path.join(res, 'ra.fsa' + suffix)
            assert os.path.exists(p) and os.path.getsize(p) > 0, suffix


class TestMakedb:
    def test_makedb_then_search(self, corpus_file, tmp_path):
        import shutil
        local = str(tmp_path / 'db.fsa')
        shutil.copy(corpus_file, local)
        r = _run(['swiftortho_tpu.cli.find_hit', '-p', 'makedb',
                  '-i', local, '-M', '262144'])
        assert r.returncode == 0, r.stderr[-500:]
        import glob
        assert glob.glob(local + '.*.npz')
        sc = str(tmp_path / 'd.sc')
        r = _run(['swiftortho_tpu.cli.find_hit', '-p', 'blastp',
                  '-i', corpus_file, '-d', local, '-o', sc,
                  '-M', '262144', '-D', local])
        assert r.returncode == 0, r.stderr[-500:]
        # same output as without prebuilt indexes
        sc2 = str(tmp_path / 'd2.sc')
        r = _run(['swiftortho_tpu.cli.find_hit', '-p', 'blastp',
                  '-i', corpus_file, '-d', local, '-o', sc2,
                  '-M', '262144'])
        assert open(sc).read() == open(sc2).read()


class TestRanges:
    def test_query_range_and_append(self, corpus_file, tmp_path):
        full = str(tmp_path / 'full.sc')
        r = _run(['swiftortho_tpu.cli.find_hit', '-p', 'blastp',
                  '-i', corpus_file, '-d', corpus_file, '-o', full,
                  '-M', '262144'])
        assert r.returncode == 0
        nq = sum(1 for l in open(corpus_file) if l.startswith('>'))
        part = str(tmp_path / 'part.sc')
        # two ranges appended = full output (the reference's restartable
        # fan-out, find_hit.py:115-146)
        half = nq // 2
        for lo, hi, mode in ((0, half, 'w'), (half, -1, 'a')):
            r = _run(['swiftortho_tpu.cli.find_hit', '-p', 'blastp',
                      '-i', corpus_file, '-d', corpus_file, '-o', part,
                      '-M', '262144', '-l', str(lo), '-u', str(hi),
                      '-O', mode])
            assert r.returncode == 0, r.stderr[-400:]
        assert open(part).read() == open(full).read()


class TestRunAllExternalTools:
    def test_stage5_uses_trimal_and_fasttree_when_present(self, corpus_file,
                                                          tmp_path):
        # end-to-end run_all with fake trimal/fasttree on PATH: stage 5
        # must route through them (reference scripts/run_all.py:213-221)
        # instead of the built-in trim + NJ
        import shutil
        import stat as stat_
        tooldir = tmp_path / 'tools'
        tooldir.mkdir()

        def mk(name, body):
            p = tooldir / name
            p.write_text('#!/bin/sh\nexport PATH=/usr/bin:/bin\n' + body)
            p.chmod(p.stat().st_mode | stat_.S_IXUSR)

        mk('trimal', '''echo "$@" > "%s/trimal_argv.txt"
IN=""; OUT=""
while [ $# -gt 0 ]; do
  case "$1" in -in) IN="$2"; shift;; -out) OUT="$2"; shift;; esac
  shift
done
cp "$IN" "$OUT"
''' % tooldir)
        mk('fasttree', '''echo "$@" > "%s/fasttree_argv.txt"
echo "(faketree:1);"
''' % tooldir)
        fas = str(tmp_path / 'ext.fsa')
        shutil.copy(corpus_file, fas)
        env = dict(ENV, PATH='%s:%s' % (tooldir, os.environ['PATH']))
        r = subprocess.run(
            [sys.executable, '-m', 'swiftortho_tpu.cli.run_all', '-i',
             fas, '-A', 'mcl', '-M', '262144', '-y', '0'],
            env=env, capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, (r.stderr[-800:], r.stdout[-300:])
        res = fas + '_results'
        nwk = open(os.path.join(res, 'ext.fsa.nwk')).read().strip()
        assert nwk == '(faketree:1);'
        argv = open(str(tooldir / 'trimal_argv.txt')).read().split()
        assert argv[-1] == '-automated1'
        assert (tooldir / 'fasttree_argv.txt').exists()
        # the raw alignment the trimmer consumed is also on disk
        assert os.path.getsize(os.path.join(res, 'ext.fsa.aln')) > 0
