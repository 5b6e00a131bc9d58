#!/usr/bin/env python
"""Full-stats tax decomposition (VERDICT r2 item 8): measure the
production dispatch (lax.map over 128-pair pallas chunks, B=4096 L=500)
at full stats, score-only, and each ablation in between, same process —
the only comparison mode the relay's run-to-run variance permits
(BASELINE 'microbenchmark noise').

Ablations ('ablate' kernel arg, output-breaking, perf probes only):
  noeq    skip the c0-window byte-equality (the idy stat input)
  nobest  skip best-cell tracking (the per-substep argmax reduce)

Run detached: nohup python tools/bench_kernel_ablate.py > log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, L = 4096, 500
BAND = 32
ITERS = 50


def main():
    import jax
    import jax.numpy as jnp
    from swiftortho_tpu.ops.banded_sw import _CHUNK
    from swiftortho_tpu.ops.banded_sw_pallas import sw_align_batch_pallas

    print('backend: %s' % jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    AA = np.frombuffer(b'ACDEFGHIKLMNPQRSTVWY', np.uint8)
    n = B // _CHUNK
    t0 = AA[rng.integers(0, 20, (n, _CHUNK, L + 12))]
    t1 = AA[rng.integers(0, 20, (n, _CHUNK, L + 12))]
    l0 = np.full((n, _CHUNK), L, np.int32)
    l1 = np.full((n, _CHUNK), L, np.int32)
    CELLS = B * L * BAND

    def run_cfg(score_only, ablate):
        @jax.jit
        def run(seed, t0, t1, l0, l1):
            def body(i, acc):
                t0x = jnp.bitwise_xor(t0,
                                      ((i + seed) & 1).astype(jnp.uint8))

                def one(args):
                    return sw_align_batch_pallas.__wrapped__(
                        *args, score_only=score_only, ablate=ablate)

                r = jax.lax.map(one, (t0x, t1, l0, l1))
                return acc + r['score'][0, (i + seed) % _CHUNK]

            return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

        chk = int(np.asarray(run(0, t0, t1, l0, l1)))   # compile + warm
        best = 0.0
        for trial in (1, 2):
            tt = time.time()
            int(np.asarray(run(trial, t0, t1, l0, l1)))
            best = max(best, CELLS * ITERS / (time.time() - tt))
        return best, chk

    for name, so, ab in (
            ('full-stats', False, ''),
            ('score-only', True, ''),
            ('full-noeq', False, 'noeq'),
            ('full-nobest', False, 'nobest'),
            ('full-noeq-nobest', False, 'noeq,nobest'),
            ('score-nobest', True, 'nobest')):
        v, chk = run_cfg(so, ab)
        print('%-18s %8.2f Gcells/s  chk=%d' % (name, v / 1e9, chk),
              flush=True)
    print('DONE', flush=True)


if __name__ == '__main__':
    main()
