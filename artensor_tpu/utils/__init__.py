"""Numeric helpers shared by the planner and the runtime.

These are host-side (numpy / pure-python) utilities; nothing here may import
jax or torch so that planner worker processes stay import-light.

Behavioral parity anchors (reference: /root/reference/artensor/utils.py:1-29):
  - log2_prod_dims   <-> log2_accum_dims
  - log10sumexp2     <-> log10sumexp2
  - log2sumexp2      <-> log2sumexp2
"""

import math

LOG10_2 = math.log10(2.0)


def log2_prod_dims(bond_dims, bonds):
    """log2 of the product of the dimensions of ``bonds``.

    Bond dimensions are stored as floats (usually 2.0); summing their log2s
    keeps everything in log-space so 1000-leg intermediates don't overflow.
    """
    return sum(math.log2(bond_dims[b]) for b in bonds)


def log2sumexp2(values):
    """log2(sum_i 2^{v_i}) computed stably; 0.0 for an empty list."""
    if not len(values):
        return 0.0
    m = max(values)
    return m + math.log2(sum(2.0 ** (v - m) for v in values))


def log10sumexp2(values):
    """log10(sum_i 2^{v_i}) computed stably; 0.0 for an empty list."""
    if not len(values):
        return 0.0
    m = max(values)
    return math.log10(sum(2.0 ** (v - m) for v in values)) + m * LOG10_2


def popcount_configs(num_bits, value):
    """Binary digits of ``value`` as a list of ints, MSB first, width num_bits."""
    return [(value >> (num_bits - 1 - k)) & 1 for k in range(num_bits)]
