#!/usr/bin/env python
"""Generate a synthetic multi-proteome corpus with known ortholog truth.

Usage: python tools/make_corpus.py out.fsa [n_taxa] [n_families] [seed]
Writes the fasta plus out.fsa.truth (gene\tfamily) for validation.
"""

import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

from swiftortho_tpu.corpus import make_corpus, write_corpus  # noqa: E402


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else 'corpus.fsa'
    n_taxa = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_fam = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 42
    corpus = make_corpus(n_taxa=n_taxa, n_families=n_fam, seed=seed)
    write_corpus(out, corpus)
    with open(out + '.truth', 'w') as fh:
        for gid, fam in sorted(corpus.family_of.items()):
            fh.write('%s\t%d\n' % (gid, fam))
    print('wrote %s: %d records, %d taxa, %d families'
          % (out, len(corpus.records), n_taxa, n_fam))


if __name__ == '__main__':
    main()
