"""Pairwise tensor contraction on the XLA path.

Every contraction-scheme step is one binary einsum.  Steps use *integer
sublist* labels, which removes the reference's 52-letter equation cap
(/root/reference/artensor/contraction.py:9-20 — intermediate tensors near
the root can exceed 52 legs on large circuits).

XLA lowers each einsum to transpose+dot_general and fuses surrounding
elementwise work; complex dtypes decompose onto real MXU matmuls.  The
``precision`` knob maps to MXU pass counts on TPU:

  'default'  one bf16 pass   (fast, ~3 decimal digits)
  'high'     three passes    (bf16x3, ~f32-ish)
  'highest'  six passes      (bf16x6, full f32 — required to match the
             torch reference to 1e-5; the reference notebook disables TF32
             for the same reason, sycamore.ipynb cell 1)
"""

import jax
import jax.numpy as jnp
from jax import lax

PRECISIONS = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}


def pairwise_einsum(a, b, ix_a, ix_b, iy, precision="highest"):
    """Contract two tensors: labels are small ints; ``iy`` may repeat labels
    of both inputs (hyperedge/batch semantics)."""
    return jnp.einsum(
        a, list(ix_a), b, list(ix_b), list(iy),
        precision=PRECISIONS.get(precision, precision),
    )
