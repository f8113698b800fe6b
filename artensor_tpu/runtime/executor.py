"""Jitted executors: run a static scheme on device, with the sliced outer loop.

The whole contraction — every einsum step, the 2^k slice enumeration, and
the accumulation — traces into ONE XLA program: the scheme is static, every
slice has identical shapes, and the slice loop is a ``lax.scan`` over slice
ids, so XLA pipelines steps and keeps everything on-device.  (The reference
executes each einsum as a separate kernel launch from Python and loops
slices in Python: /root/reference/artensor/contraction.py:62-76,
simulation.py:203-210.)
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.einsum import pairwise_einsum


def execute_dense(tensors, steps, precision="highest"):
    """Run dense scheme ``steps`` over a list of device arrays (traceable)."""
    bufs = list(tensors)
    last = 0
    for s in steps:
        bufs[s.i] = pairwise_einsum(
            bufs[s.i], bufs[s.j], s.ix_i, s.ix_j, s.iy, precision)
        bufs[s.j] = None  # free for XLA liveness
        last = s.i
    return bufs[last]


def tensor_contraction(tensors, steps, precision="highest"):
    """Eager convenience wrapper (reference-parity name)."""
    return execute_dense([jnp.asarray(t) for t in tensors], steps, precision)


def slice_select(tensors, slicing_axes, slice_id, num_sliced):
    """Select one slice configuration (traceable).

    ``slicing_axes``: list over sliced bonds (MSB-first like the reference's
    ``np.binary_repr`` convention) of lists of (tensor_id, axis).  Axes are
    pre-adjusted by :func:`build_slicing_axes` for the axis shifts caused by
    earlier selections on the same tensor.
    """
    bufs = list(tensors)
    k = num_sliced
    for x, pairs in enumerate(slicing_axes):
        bit = (slice_id >> (k - 1 - x)) & 1
        for tid, ax in pairs:
            bufs[tid] = lax.dynamic_index_in_dim(
                bufs[tid], bit, axis=ax, keepdims=False)
    return bufs


def build_slicing_axes(tensor_bonds, slicing_bonds, batched_tensors=()):
    """Compute static (tensor_id, axis) selections for each sliced bond.

    ``tensor_bonds`` is the UNSLICED bond mapping (all bonds present).
    ``batched_tensors``: ids whose payload carries a leading amplitude-batch
    axis (sparse-mode final-qubit tensors) — their bond axes shift by one.
    Axes are adjusted for earlier selections on the same tensor, fixing the
    reference's latent axis-shift bug when one tensor carries two sliced
    bonds (simulation.py:60-65 computes indices against the original layout
    but applies them sequentially).
    """
    batched = set(batched_tensors)
    per_tensor = {}
    for x, bond in enumerate(slicing_bonds):
        for tid, bonds in tensor_bonds.items():
            if bond in bonds:
                off = 1 if tid in batched else 0
                per_tensor.setdefault(tid, []).append(
                    (x, bonds.index(bond) + off))
    slicing_axes = [[] for _ in slicing_bonds]
    for tid, pairs in per_tensor.items():
        # selections happen in bond order x; adjust each axis for the axes
        # of the same tensor already removed by earlier bonds
        pairs.sort(key=lambda p: p[0])
        applied = []
        for x, ax in pairs:
            shift = sum(1 for r in applied if r < ax)
            slicing_axes[x].append((tid, ax - shift))
            applied.append(ax)
    return slicing_axes


def make_sliced_contraction(steps, slicing_axes, num_sliced, output_shape,
                            precision="highest", unroll=1):
    """Build a traceable function: tensors -> sum over all 2^k slices.

    The slice loop is a scan so the compiled program is O(steps), not
    O(steps * 2^k); per-slice shapes are identical.
    """
    def run(tensors, slice_ids=None, init=None):
        if num_sliced == 0:
            return execute_dense(tensors, steps, precision)
        if slice_ids is None:
            ids = jnp.arange(2 ** num_sliced, dtype=jnp.int32)
        else:
            ids = slice_ids

        def body(acc, sid):
            sliced = slice_select(tensors, slicing_axes, sid, num_sliced)
            return acc + execute_dense(sliced, steps, precision), None

        if init is None:
            init = jnp.zeros(output_shape, dtype=tensors[0].dtype)
        acc, _ = lax.scan(body, init, ids, unroll=unroll)
        return acc

    return run


def compile_dense(steps, slicing_axes, num_sliced, output_shape,
                  precision="highest", donate=False):
    """jit-compiled full contraction (slice loop included)."""
    fn = make_sliced_contraction(
        steps, slicing_axes, num_sliced, output_shape, precision)
    return jax.jit(fn)
