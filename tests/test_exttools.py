"""External-tool probe-and-fallback (analysis/exttools.py).

The reference shells out to famsa/mafft/muscle (scripts/rbh2phy.py:
203-214), trimal and fasttree (scripts/run_all.py:213-221); this suite
shims fake tools that record their argv and forces BOTH branches of
every dispatcher: external-used-when-present, built-in-when-absent.
"""

import os
import stat
import subprocess

import pytest

from swiftortho_tpu.analysis import exttools
from swiftortho_tpu.analysis.msa import center_star_msa

SEQS = ['MKVLAT', 'MKVLAS', 'MKVIAT']      # equal length: identity MSA
IDS = ['t0|g0', 't1|g0', 't2|g0']


def _mk_tool(d, name, body):
    path = os.path.join(str(d), name)
    with open(path, 'w') as out:
        out.write('#!/bin/sh\n' + body)
    os.chmod(path, os.stat(path).st_mode | stat.S_IXUSR)
    return path


def _fake_muscle(d):
    # reference argv: muscle -in IN -out OUT -fasta -quiet.  Appends
    # "--" to every row so tests can PROVE the external output was used
    # (an identity copy is indistinguishable from the center-star
    # fallback on equal-length inputs).
    return _mk_tool(d, 'muscle', '''\
export PATH=/usr/bin:/bin
echo "$@" > "%s/muscle_argv.txt"
IN=""; OUT=""
while [ $# -gt 0 ]; do
  case "$1" in -in) IN="$2"; shift;; -out) OUT="$2"; shift;; esac
  shift
done
sed 's/^\\([^>].*\\)$/\\1--/' "$IN" > "$OUT"
''' % d)


def _fake_famsa(d):
    # reference argv: famsa -t 4 IN OUT
    return _mk_tool(d, 'famsa', '''\
export PATH=/usr/bin:/bin
echo "$@" > "%s/famsa_argv.txt"
sed 's/^\\([^>].*\\)$/\\1--/' "$3" > "$4"
''' % d)


def _fake_mafft(d):
    # reference argv: mafft --quiet --auto IN > OUT
    return _mk_tool(d, 'mafft', '''\
export PATH=/usr/bin:/bin
echo "$@" > "%s/mafft_argv.txt"
sed 's/^\\([^>].*\\)$/\\1--/' "$3"
''' % d)


@pytest.fixture
def toolpath(tmp_path, monkeypatch):
    monkeypatch.setenv('PATH', str(tmp_path))
    monkeypatch.delenv('SWIFTORTHO_NO_EXTERNAL', raising=False)
    return tmp_path


def test_muscle_dispatch_records_reference_argv(toolpath):
    _fake_muscle(toolpath)
    rows = exttools.align_family(IDS, SEQS)
    assert rows == [s + '--' for s in SEQS]   # the shim's output, used
    argv = open(os.path.join(str(toolpath), 'muscle_argv.txt')).read()
    parts = argv.split()
    assert parts[0] == '-in' and parts[2] == '-out'
    assert parts[4:] == ['-fasta', '-quiet']


def test_probe_order_famsa_beats_muscle(toolpath):
    _fake_muscle(toolpath)
    _fake_famsa(toolpath)
    rows = exttools.align_family(IDS, SEQS)
    assert rows == [s + '--' for s in SEQS]
    famsa_argv = open(os.path.join(str(toolpath),
                                   'famsa_argv.txt')).read().split()
    assert famsa_argv[:2] == ['-t', '4']
    assert not os.path.exists(os.path.join(str(toolpath),
                                           'muscle_argv.txt'))


def test_mafft_stdout_capture(toolpath):
    _fake_mafft(toolpath)
    rows = exttools.align_family(IDS, SEQS)
    assert rows == [s + '--' for s in SEQS]
    argv = open(os.path.join(str(toolpath), 'mafft_argv.txt')).read()
    assert argv.split()[:2] == ['--quiet', '--auto']


def test_fallback_when_absent(toolpath):
    # empty PATH dir: built-in center-star is the result
    assert exttools.msa_tool() is None
    assert exttools.align_family(IDS, SEQS) == center_star_msa(SEQS)


def test_no_external_env_forces_builtin(toolpath, monkeypatch):
    _fake_muscle(toolpath)
    monkeypatch.setenv('SWIFTORTHO_NO_EXTERNAL', '1')
    assert exttools.msa_tool() is None
    assert exttools.align_family(IDS, SEQS) == center_star_msa(SEQS)
    assert not os.path.exists(os.path.join(str(toolpath),
                                           'muscle_argv.txt'))


def test_tool_failure_falls_back(toolpath):
    _mk_tool(toolpath, 'muscle', 'exit 1\n')
    assert exttools.align_family(IDS, SEQS) == center_star_msa(SEQS)


def test_reordered_output_restored_to_input_order(toolpath):
    # external aligners may emit records in their own order
    import sys
    _mk_tool(toolpath, 'muscle', '''\
IN=""; OUT=""
while [ $# -gt 0 ]; do
  case "$1" in -in) IN="$2"; shift;; -out) OUT="$2"; shift;; esac
  shift
done
%s - "$IN" "$OUT" <<'EOF'
import sys
recs = []
for line in open(sys.argv[1]):
    if line.startswith('>'): recs.append([line, ''])
    else: recs[-1][1] += line.strip()
with open(sys.argv[2], 'w') as out:
    for h, s in reversed(recs):
        out.write(h + s + '\\n')
EOF
''' % sys.executable)
    rows = exttools.align_family(IDS, SEQS)
    assert rows == SEQS                     # input order restored


def test_trimal_dispatch(toolpath, tmp_path):
    aln = tmp_path / 'x.aln'
    aln.write_text('>a\nAC-E\n>b\nACDE\n')
    out = tmp_path / 'x.aln.trim'
    # absent: False, nothing written
    assert not exttools.trim_alignment_file(str(aln), str(out))
    assert not out.exists()
    _mk_tool(toolpath, 'trimal', '''\
export PATH=/usr/bin:/bin
echo "$@" > "%s/trimal_argv.txt"
IN=""; OUT=""
while [ $# -gt 0 ]; do
  case "$1" in -in) IN="$2"; shift;; -out) OUT="$2"; shift;; esac
  shift
done
cp "$IN" "$OUT"
''' % toolpath)
    assert exttools.trim_alignment_file(str(aln), str(out))
    assert out.read_text() == aln.read_text()
    argv = open(os.path.join(str(toolpath), 'trimal_argv.txt')).read()
    assert argv.split()[-1] == '-automated1'


def test_fasttree_dispatch(toolpath, tmp_path):
    aln = tmp_path / 'x.aln.trim'
    aln.write_text('>a\nACDE\n>b\nACDF\n')
    assert exttools.tree_from_file(str(aln)) is None   # absent
    _mk_tool(toolpath, 'fasttree', '''\
echo "$@" > "%s/fasttree_argv.txt"
echo "(a:0.1,b:0.1);"
''' % toolpath)
    nwk = exttools.tree_from_file(str(aln))
    assert nwk == '(a:0.1,b:0.1);'
    argv = open(os.path.join(str(toolpath),
                             'fasttree_argv.txt')).read().split()
    # the reference's exact flag set (scripts/run_all.py:220)
    assert argv[:-1] == ['-quiet', '-wag', '-gamma', '-pseudo', '-spr',
                         '4', '-mlacc', '2', '-slownni', '-no2nd',
                         '-boot', '1000']


def test_rbh2phy_uses_external_when_present(toolpath, tmp_path):
    # end-to-end through analysis/rbh.rbh2phy with a recording famsa
    _fake_famsa(toolpath)
    from swiftortho_tpu.analysis.rbh import rbh2phy
    from swiftortho_tpu.io_fasta import SeqDB
    fsa = tmp_path / 'c.fsa'
    fsa.write_text(''.join('>%s\n%s\n' % (i, s)
                           for i, s in zip(IDS, SEQS)))
    db = SeqDB.from_path(str(fsa))
    m8 = ('{q}\t{s}\t100\t6\t0\t0\t1\t6\t1\t6\t1e-9\t42\n')
    lines = [m8.format(q=q, s=s)
             for q in IDS for s in IDS if q != s]
    recs = rbh2phy(lines, db)
    assert recs and os.path.exists(
        os.path.join(str(toolpath), 'famsa_argv.txt'))
