"""Pallas MXU kernel: fused split-complex batched matmul.

One contraction step in split representation costs 4 real matmuls
(re = ar.br - ai.bi, im = ar.bi + ai.br).  XLA runs them as separate dots,
reading every operand twice from HBM.  This kernel fuses all four products
per (M, N) tile: each operand tile is DMA'd into VMEM once and used by both
its products, halving operand HBM traffic — the binding constraint for the
mid-size contraction steps.

Grid: (B, M/bm, N/bn); K is kept whole per tile (contraction steps have
K <= a few thousand).  Falls back to XLA dots through ops.field unless
explicitly enabled (SplitField(..., use_pallas=True) — experimental).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _kernel(ar_ref, ai_ref, br_ref, bi_ref, re_ref, im_ref):
    import jax.numpy as jnp

    ar = ar_ref[0]
    ai = ai_ref[0]
    br = br_ref[0]
    bi = bi_ref[0]
    dot = functools.partial(
        jnp.dot, precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    re_ref[0] = dot(ar, br) - dot(ai, bi)
    im_ref[0] = dot(ar, bi) + dot(ai, br)


def complex_batched_matmul(a, b, bm=256, bn=256):
    """(re, im) batched matmul via one fused Pallas kernel.

    a: pair of (B, M, K) f32; b: pair of (B, K, N) f32 -> pair of (B, M, N).
    M and N must be multiples of the tile sizes (the caller pads or falls
    back to XLA otherwise).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ar, ai = a
    br, bi = b
    B, M, K = ar.shape
    _, _, N = br.shape
    bm = min(bm, M)
    bn = min(bn, N)
    if M % bm or N % bn:
        raise ValueError("tile sizes must divide M and N")
    grid = (B, M // bm, N // bn)
    a_spec = pl.BlockSpec((1, bm, K), lambda b_, i, j: (b_, i, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, K, bn), lambda b_, i, j: (b_, 0, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, bm, bn), lambda b_, i, j: (b_, i, j),
                          memory_space=pltpu.VMEM)
    re, im = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[a_spec, a_spec, b_spec, b_spec],
        out_specs=(o_spec, o_spec),
        out_shape=(jax.ShapeDtypeStruct((B, M, N), jnp.float32),
                   jax.ShapeDtypeStruct((B, M, N), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * M * N * K,
            bytes_accessed=4 * B * (2 * M * K + 2 * K * N + 2 * M * N),
            transcendentals=0),
    )(ar, ai, br, bi)
    return re, im
