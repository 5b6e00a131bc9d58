#!/usr/bin/env python
"""A/B the APC default (VERDICT r4 item 4): reference-faithful streaming
AP vs the textbook AP at ~100k-graph scale on a REAL ortholog table
(e.g. /tmp/scale102_600/c.opc from tools/run_scale.py).

Reports wall time per mode and partition agreement (identical groups /
total), so the default-mode decision is a measurement, not a preference.
Host-forced by default (keeps the chip free; SWIFTORTHO_PLATFORM=tpu
overrides).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update('jax_platforms',
                  os.environ.get('SWIFTORTHO_PLATFORM', 'cpu'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--opc', default='/tmp/scale102_600/c.opc')
    ap.add_argument('--damp', type=float, default=0.5)
    args = ap.parse_args()

    from swiftortho_tpu.config import ClusterConfig
    from swiftortho_tpu.cluster.driver import find_cluster_stream

    def run(faithful):
        cfg = ClusterConfig(algorithm='apc', damping=args.damp,
                            faithful=faithful)
        t0 = time.time()
        with open(args.opc) as fh:
            groups = [ln.rstrip('\n') for ln in
                      find_cluster_stream(fh, cfg)]
        return time.time() - t0, groups

    nlines = sum(1 for _ in open(args.opc))
    print('input: %s (%d rows)' % (args.opc, nlines), flush=True)

    t_f, g_f = run(True)
    print('faithful: %.1fs  %d groups' % (t_f, len(g_f)), flush=True)
    t_t, g_t = run(False)
    print('textbook: %.1fs  %d groups' % (t_t, len(g_t)), flush=True)

    sf, st = set(g_f), set(g_t)
    inter = len(sf & st)
    print('identical groups: %d / %d faithful (%.1f%%), %d textbook'
          % (inter, len(sf), 100.0 * inter / max(1, len(sf)), len(st)))
    print('slowdown faithful/textbook: %.2fx' % (t_f / t_t))


if __name__ == '__main__':
    main()
