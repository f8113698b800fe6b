"""Jitted executors: run a static scheme on device, with the sliced outer loop.

The whole contraction — every einsum step, the 2^k slice enumeration, and
the accumulation — traces into ONE XLA program: the scheme is static, every
slice has identical shapes, and the slice loop is a ``lax.scan`` over slice
ids, so XLA pipelines steps and keeps everything on-device.  (The reference
executes each einsum as a separate kernel launch from Python and loops
slices in Python: /root/reference/artensor/contraction.py:62-76,
simulation.py:203-210.)

All numeric work goes through a Field (ops/field.py): complex tensors are
(re, im) pairs on TPU (no complex dtype on the MXU), or native complex on
CPU.  Executors are representation-agnostic.
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.field import make_field


def execute_dense(tensors, steps, field):
    """Run dense scheme ``steps`` over staged field tensors (traceable)."""
    bufs = list(tensors)
    last = 0
    for s in steps:
        bufs[s.i] = field.einsum(bufs[s.i], bufs[s.j], s.ix_i, s.ix_j, s.iy)
        bufs[s.j] = None  # free for XLA liveness
        last = s.i
    return bufs[last]


def tensor_contraction(tensors, steps, field=None):
    """Eager convenience wrapper (reference-parity name): numpy in/out."""
    field = field or make_field()
    staged = [field.wrap(t) for t in tensors]
    return field.unwrap(execute_dense(staged, steps, field))


def slice_select(tensors, slicing_axes, slice_id, num_sliced, field):
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
            bufs[tid] = field.index(bufs[tid], bit, ax)
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


def make_sliced_runner(execute, steps, slicing_axes, num_sliced, output_shape,
                       field, unroll=1):
    """Traceable fn: tensors -> sum over slices of ``execute(sliced, steps)``.

    Shared by the dense and sparse paths; the slice loop is a scan so the
    compiled program is O(steps), not O(steps * 2^k).
    """
    def run(tensors, slice_ids=None, init=None):
        if num_sliced == 0:
            return execute(tensors, steps, field)
        ids = (jnp.arange(2 ** num_sliced, dtype=jnp.int32)
               if slice_ids is None else slice_ids)

        def body(acc, sid):
            sliced = slice_select(tensors, slicing_axes, sid, num_sliced, field)
            return field.add(acc, execute(sliced, steps, field)), None

        if init is None:
            init = field.zeros(output_shape)
        acc, _ = lax.scan(body, init, ids, unroll=unroll)
        return acc

    return run


def make_sliced_contraction(steps, slicing_axes, num_sliced, output_shape,
                            field, unroll=1):
    """Dense-path sliced runner (see make_sliced_runner)."""
    return make_sliced_runner(execute_dense, steps, slicing_axes, num_sliced,
                              output_shape, field, unroll)


def compile_dense(steps, slicing_axes, num_sliced, output_shape, field):
    """jit-compiled full dense contraction (slice loop included)."""
    return jax.jit(make_sliced_contraction(
        steps, slicing_axes, num_sliced, output_shape, field))
