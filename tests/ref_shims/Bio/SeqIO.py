"""Minimal SeqIO.parse for fasta, matching what the reference scripts use
(record .id = first whitespace token of the header, .seq = joined lines)."""


class _Record:
    def __init__(self, rid, seq):
        self.id = rid
        self.seq = seq

    def __str__(self):
        return self.seq


def parse(source, fmt):
    assert fmt == 'fasta', fmt
    fh = open(source) if isinstance(source, str) else source
    rid, chunks = None, []
    for line in fh:
        line = line.rstrip('\n')
        if line.startswith('>'):
            if rid is not None:
                yield _Record(rid, ''.join(chunks))
            rid = line[1:].split(' ')[0]
            chunks = []
        elif line:
            chunks.append(line.strip())
    if rid is not None:
        yield _Record(rid, ''.join(chunks))
    if isinstance(source, str):
        fh.close()


def write(records, handle, fmt):
    """Minimal fasta writer (reference rbh2phy.py:196 writes the
    per-family selection output through SeqIO.write; parity tests
    compare files via parse, so wrapping is irrelevant)."""
    assert fmt == 'fasta', fmt
    n = 0
    for r in records:
        handle.write('>%s\n%s\n' % (r.id, str(r.seq)))
        n += 1
    return n
