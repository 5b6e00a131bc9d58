#!/usr/bin/env python
"""VPU op-count roofline for the banded-SW Pallas kernel (VERDICT r3
item 5).

Counts the vector ALU ops of ONE kernel substep by tracing the exact
substep computation (reproduced from ops/banded_sw_pallas._kernel with
jnp on (16, B) blocks) to a jaxpr and tallying elementwise primitives,
then converts to a cells/s ceiling:

    ceiling = VPU_throughput / (ops_per_substep / cells_per_substep)

One substep computes NS*B = 16*B band cells.  v5e public specs (How to
Scale Your Model / cloud docs): TensorCore clock 940 MHz, VPU = four
(8, 128) vector sub-units -> 4096 lanes -> 3.85e12 int32 ALU ops/s.
The count EXCLUDES VMEM window copies, the per-grid-step scratch
read/write and the cross-slot best merge (amortized 1/blk_t per
substep), and assumes every elementwise primitive costs one VPU pass —
multi-pass ops (i32 multiply, variable shifts) are tallied separately
with their pass counts so the ceiling brackets the truth.

Run on CPU: python tools/roofline_sw.py
"""

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

NS, B = 16, 128
PACK = 1 << 14
_STAR, _DIAG, _DASH, _PIPE = 0, 1, 2, 3
GO, GE = -11, -1
XD = 0  # unused


def _shift_down(x):
    return jnp.concatenate([jnp.zeros((1,) + x.shape[1:], x.dtype),
                            x[:-1]], axis=0)


def _shift_up(x):
    return jnp.concatenate([x[1:],
                            jnp.zeros((1,) + x.shape[1:], x.dtype)],
                           axis=0)


def substep(p, stats, per_slot, c0w, c1w, p0w, l0v, l1v, t,
            H1, TOP1, IA1, MG1, Hd, TOPd, IAd, MGd, best):
    """Verbatim math of banded_sw_pallas._kernel.substep (see that file;
    window() data movement excluded — it is VMEM copy, not VPU ALU)."""
    e_col = jax.lax.broadcasted_iota(jnp.int32, (NS, B), 0)
    c1code = jnp.bitwise_and(c1w, 31)
    widx = jnp.right_shift(c1code, 3)
    w = jnp.where(widx == 0, p0w[:, 0, :],
                  jnp.where(widx == 1, p0w[:, 1, :], p0w[:, 2, :]))
    sh = jnp.left_shift(jnp.bitwise_and(c1code, 7), 2)
    sub = jnp.bitwise_and(jnp.right_shift(w, sh), 15) - 4
    if stats:
        r1 = jnp.right_shift(c1w, 5)
        r0 = jnp.right_shift(c0w, 5)
        eqi = ((r1 == r0) & (r1 > 0)).astype(jnp.int32)

    iv = t + 8 + p - e_col
    jv = t + e_col - 7
    computed = (iv >= 1) & (jv >= 1) & (iv <= l1v) & (jv <= l0v)

    if p == 0:
        Hl, TOPl, IAl, MGl = H1, TOP1, IA1, MG1
        Hu, TOPu, IAu, MGu = map(_shift_up, (H1, TOP1, IA1, MG1))
    else:
        Hl, TOPl, IAl, MGl = map(_shift_down, (H1, TOP1, IA1, MG1))
        Hu, TOPu, IAu, MGu = H1, TOP1, IA1, MG1

    trl = jnp.bitwise_and(jnp.right_shift(TOPl, 2), 3)
    tru = jnp.bitwise_and(jnp.right_shift(TOPu, 2), 3)
    opl = jnp.bitwise_and(TOPl, 3)
    opu = jnp.bitwise_and(TOPu, 3)

    Iv = Hl + jnp.where(trl == _DASH, GE, GO)
    M = Hd + sub
    D = Hu + jnp.where(tru == _PIPE, GE, GO)
    Bv = jnp.maximum(jnp.maximum(0, Iv), jnp.maximum(M, D))
    is_m = Bv == M
    is_i = (~is_m) & (Bv == Iv)
    is_d = (~is_m) & (~is_i) & (Bv == D)
    is_star = (~is_m) & (~is_i) & (~is_d)

    gap_i = jnp.where(opl != 2, 1, 0)
    gap_d = jnp.where(opu != 1, 1, 0)

    tr_new = jnp.where(is_m, _DIAG,
                       jnp.where(is_i, _DASH,
                                 jnp.where(is_d, _PIPE, _STAR)))
    op_new = jnp.where(is_i & (opl != 2), 2,
                       jnp.where(is_d & (opu != 1), 1, 0))
    TOPn = jnp.left_shift(tr_new, 2) + op_new

    inmat = (iv >= 0) & (jv >= 0) & (iv <= l1v) & (jv <= l0v)
    is_row0 = inmat & (iv == 0)
    is_col0 = inmat & (jv == 0) & (iv > 0)
    bd_aln = jnp.where(is_row0, jv, jnp.where(is_col0, iv, 0))
    bd_odd = jnp.bitwise_and(bd_aln, 1) == 1
    bd_op = jnp.where(is_row0 & (jv > 0) & bd_odd, 2,
                      jnp.where(is_col0 & bd_odd, 1, 0))

    Hn = jnp.where(computed, Bv, 0)

    if stats:
        IAn = jnp.where(is_m, IAd + eqi * PACK + 1,
                        jnp.where(is_i, IAl + 1,
                                  jnp.where(is_d, IAu + 1, 0)))
        MGn = jnp.where(is_m, MGd + (1 - eqi) * PACK,
                        jnp.where(is_i, MGl + PACK + gap_i,
                                  jnp.where(is_d, MGu + PACK + gap_d,
                                            0)))
        STn = jnp.where(is_star, iv * PACK + jv,
                        jnp.where(is_m, jnp.right_shift(TOPd, 4),
                                  jnp.where(is_i,
                                            jnp.right_shift(TOPl, 4),
                                            jnp.right_shift(TOPu, 4))))
        TOPn = TOPn + jnp.left_shift(STn, 4)
        bd_MG = bd_aln * PACK + (bd_aln + 1) // 2
        IAn = jnp.where(computed, IAn,
                        jnp.where(is_row0 | is_col0, bd_aln, 0))
        MGn = jnp.where(computed, MGn,
                        jnp.where(is_row0 | is_col0, bd_MG, 0))
    else:
        IAn = MGn = jnp.zeros((NS, B), jnp.int32)
    TOPn = jnp.where(computed, TOPn, bd_op)

    bH, bIJ, bIA, bMG, bTOP = best
    if per_slot:
        ij = iv * 8192 + jv
        better = computed & ((Bv > bH) | ((Bv == bH) & (Bv > 0)
                                          & (ij < bIJ)))
        nbest = (jnp.where(better, Bv, bH),
                 jnp.where(better, ij, bIJ),
                 jnp.where(better, IAn, bIA),
                 jnp.where(better, MGn, bMG),
                 jnp.where(better, TOPn, bTOP))
        return (Hn, TOPn, IAn, MGn), nbest
    return (Hn, TOPn, IAn, MGn), best


# ops treated as multi-pass on the VPU (public TPU ISA knowledge is
# thin; int multiplies and per-lane variable shifts are commonly >1
# pass — tally both bounds)
MULTI = {'mul': 3, 'shift_right_logical': 1, 'shift_left': 1,
         'shift_right_arithmetic': 1}
# pure data movement / free in a fused kernel
FREE = {'concatenate', 'broadcast_in_dim', 'convert_element_type',
        'iota', 'squeeze', 'slice', 'reshape', 'copy'}
# call wrappers: their body is walked separately — counting the wrapper
# too would double-count every jnp helper
WRAPPERS = {'jit', 'pjit', 'closed_call', 'custom_jvp_call',
            'custom_vjp_call'}


def count(stats, per_slot):
    z = jnp.zeros((NS, B), jnp.int32)
    p0w = jnp.zeros((NS, 3, B), jnp.int32)
    l0 = jnp.zeros((1, B), jnp.int32)
    best = (z[:1] * 0 + z, z, z, z, z) if per_slot else None
    best = (z, z, z, z, z)

    def f(c0w, c1w, p0w, l0v, l1v, H1, TOP1, IA1, MG1, Hd, TOPd, IAd,
          MGd, bH, bIJ, bIA, bMG, bTOP):
        # both parities of one t-step (the unroll body)
        st1, best1 = substep(0, stats, per_slot, c0w, c1w, p0w, l0v, l1v,
                             jnp.int32(7), H1, TOP1, IA1, MG1,
                             Hd, TOPd, IAd, MGd,
                             (bH, bIJ, bIA, bMG, bTOP))
        st2, best2 = substep(1, stats, per_slot, c0w, c1w, p0w, l0v, l1v,
                             jnp.int32(7), *st1, H1, TOP1, IA1, MG1,
                             best1)
        return st2, best2

    jaxpr = jax.make_jaxpr(f)(z, z, p0w, l0, l0, z, z, z, z, z, z, z, z,
                              z, z, z, z, z)
    ops = Counter()

    def walk(jx):
        for eq in jx.eqns:
            for sub in eq.params.values():
                if hasattr(sub, 'jaxpr'):
                    walk(sub.jaxpr)
            if eq.primitive.name in WRAPPERS:
                continue
            # weight each primitive by its output size in (NS, B)-block
            # passes (comparisons on (1, B) length vectors etc. count
            # 1/16 of a pass)
            shape = getattr(eq.outvars[0].aval, 'shape', ())
            passes = float(np.prod(shape)) / (NS * B) if shape else 0.0
            ops[eq.primitive.name] += passes

    walk(jaxpr.jaxpr)
    lo = sum(n for k, n in ops.items() if k not in FREE)
    hi = lo + sum((MULTI.get(k, 1) - 1) * n for k, n in ops.items()
                  if k in MULTI)
    return ops, lo, hi


def main():
    VPU = 3.85e12          # 940 MHz x 4096 lanes (v5e public specs)
    cells = 2 * NS * B     # two substeps per counted body
    for stats, per_slot, name in ((True, True, 'full stats, per-slot'),
                                  (False, True, 'score-only, per-slot')):
        ops, lo, hi = count(stats, per_slot)
        print('=== %s ===' % name)
        print('vector primitives (one t-step, both parities, %d cells):'
              % cells)
        for k, n in sorted(ops.items(), key=lambda kv: -kv[1]):
            flag = ' (free)' if k in FREE else (
                ' (x%d passes?)' % MULTI[k] if k in MULTI else '')
            print('  %-28s %5.1f%s' % (k, n, flag))
        for nops, tag in ((lo, 'every op 1 pass'),
                          (hi, 'i32 mul 3 passes')):
            # nops is in (NS, B)-block passes; one pass = NS*B lane-ops
            # and the counted body covers 2 substeps = 2*NS*B cells
            per_cell = nops * NS * B / cells
            print('  -> %.0f block passes = %.1f ALU ops/cell -> '
                  'ceiling %.2e cells/s  [%s]'
                  % (nops, per_cell, VPU / per_cell, tag))
    print('\nmeasured (BASELINE.md r3/r4): full stats 1.82e10, '
          'score-only 2.40e10 cells/s')


if __name__ == '__main__':
    main()
