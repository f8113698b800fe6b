"""Scientific-notation execution: per-step magnitude renormalization.

Deep contractions of large circuits drive amplitude magnitudes far below
float32 range; the reference's ``scientific_notation`` flag rescales every
intermediate by its max magnitude and accumulates the log10 factor
(/root/reference/artensor/contraction.py:197-203).  This module provides
the TPU-native equivalent — and, unlike the reference, composes correctly
with slicing: sliced partial sums carry their own factors and are combined
in max-factor units (the reference's slice loop would add mismatched
mantissas).

Results are (tensor, log10_factor): true value = tensor * 10**factor.
"""

import jax.numpy as jnp
from jax import lax

from .executor import slice_select
from .lowering import physical_shape


def _factor_dtype(field):
    rdt = getattr(field, "rdtype", None)
    if rdt is not None:
        return rdt
    return jnp.zeros((), field.dtype).real.dtype


def execute_rescaled(apply_step, tensors, steps, field):
    """Run a scheme, renormalizing after every step (traceable)."""
    bufs = list(tensors)
    factor = jnp.zeros((), dtype=_factor_dtype(field))
    last = 0
    for s in steps:
        out = apply_step(field, bufs[s.i], bufs[s.j], s)
        norm = field.max_abs(out)
        safe = jnp.where(norm > 0, norm, 1.0)
        out = field.scale(out, 1.0 / safe)
        factor = factor + jnp.log10(safe)
        bufs[s.i] = out
        bufs[s.j] = None
        last = s.i
    return bufs[last], factor


def combine_rescaled(a, b, field):
    """(t1, f1) + (t2, f2) -> common-factor sum (max-factor units)."""
    t1, f1 = a
    t2, f2 = b
    m = jnp.maximum(f1, f2)
    ten = jnp.asarray(10.0, dtype=m.dtype)
    t = field.add(field.scale(t1, ten ** (f1 - m)),
                  field.scale(t2, ten ** (f2 - m)))
    return t, m


def make_rescaled_runner(apply_step, steps, slicing_axes, num_sliced,
                         output_shape, field):
    """Sliced rescaled contraction: returns (tensor, log10_factor)."""
    phys_out = physical_shape(output_shape)

    def run(tensors, slice_ids=None):
        if num_sliced == 0:
            return execute_rescaled(apply_step, tensors, steps, field)
        ids = (jnp.arange(2 ** num_sliced, dtype=jnp.int32)
               if slice_ids is None else slice_ids)

        def body(carry, sid):
            sliced = slice_select(tensors, slicing_axes, sid, num_sliced, field)
            part = execute_rescaled(apply_step, sliced, steps, field)
            return combine_rescaled(carry, part, field), None

        init = (field.zeros(phys_out),
                jnp.asarray(-1e30, dtype=_factor_dtype(field)))
        (acc, factor), _ = lax.scan(body, init, ids)
        return acc, factor

    return run
