"""Reference-compatible flag parsing.

The reference accepts both '-k value' and '-kvalue' forms with a defaults
dict (bin/find_hit.py:227-242 et al.); we reproduce that surface so the
CLIs are drop-in replacements.
"""

from __future__ import annotations

from typing import Dict, List


def parse_args(argv: List[str], defaults: Dict[str, str]) -> Dict[str, str]:
    args = dict(defaults)
    i = 1
    n = len(argv)
    while i < n:
        k = argv[i]
        if k in args:
            if i + 1 < n:
                args[k] = argv[i + 1]
                i += 2
                continue
            break
        elif k[:2] in args and len(k) > 2:
            args[k[:2]] = k[2:]
        i += 1
    return args
