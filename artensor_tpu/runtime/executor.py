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
from .lowering import apply_lowered, physical_shape


def stage_tensors(field, arrays):
    """Stage numpy payloads on device in flat physical form."""
    out = []
    for a in arrays:
        x = field.wrap(a)
        out.append(field.reshape(x, physical_shape(a.shape)))
    return out


def precompute_static_steps(steps, arrays, slicing_axes=(),
                            max_elems=1 << 18):
    """Evaluate slice-independent, batch-free steps on the host and drop
    them from the device program.

    After gate-block fusion most of a scheme's steps are tiny merges of
    gate tensors that no sliced bond or amplitude batch ever touches —
    identical for every slice.  Folding them at staging time removes
    their per-step overhead from the compiled scan body (the measured
    fixed cost per step is the width-amortized term of the wall
    estimator) and shrinks trace/compile time.  The reference executes
    every step per slice from Python (/root/reference/artensor/
    simulation.py:203-210).

    A step folds when neither operand is DYNAMIC (dynamic = carries a
    sliced bond per ``slicing_axes``, carries an amplitude batch — its
    array rank then disagrees with the step's leg count — or was
    produced by a dynamic step) and both operands are small.  Returns
    ``(remaining_steps, arrays2)``; ``arrays2`` holds folded results in
    the producing slots (consumed slots are shrunk to scalars so they
    stage for free).
    """
    import numpy as np

    dyn = {tid for spec in slicing_axes for (tid, _a, _d, _p) in spec}
    arrays = [np.asarray(a) for a in arrays]
    out = []
    for n_s, s in enumerate(steps):
        i, j = s.i, s.j
        # the FINAL step always runs on device: the executors return the
        # last step's result slot, and a fully-folded scheme would leave
        # them nothing to produce it from
        ok = (n_s < len(steps) - 1
              and i not in dyn and j not in dyn
              and getattr(s, "gathers", None) is None
              and getattr(s, "reshape", None) is None
              and getattr(s, "post_select", None) is None
              and i < len(arrays) and j < len(arrays))
        if ok:
            ti, tj = arrays[i], arrays[j]
            ok = (ti.ndim == len(s.ix_i) and tj.ndim == len(s.ix_j)
                  and ti.size <= max_elems and tj.size <= max_elems)
        if not ok:
            dyn.add(i)
            out.append(s)
            continue
        res = np.einsum(ti, list(s.ix_i), tj, list(s.ix_j), list(s.iy))
        if res.size > max_elems:
            dyn.add(i)
            out.append(s)
            continue
        arrays[i] = np.ascontiguousarray(res)
        arrays[j] = np.zeros((), dtype=arrays[j].dtype)  # dead slot
    return out, arrays


def apply_dense_step(field, x, y, s):
    if getattr(s, "lane", None) is not None \
            and getattr(field, "supports_lanes", False):
        from .gatherk import GKPlan, apply_gk_step
        from .lanes import PairPlan, apply_lane_step, apply_pair_step

        if isinstance(s.lane, GKPlan):
            return apply_gk_step(field, x, y, s.lane)
        if isinstance(s.lane, PairPlan):
            return apply_pair_step(field, x, y, s.lane)
        return apply_lane_step(field, x, y, s.lane)
    return apply_lowered(field, x, y, s.lowered)


def execute_dense(tensors, steps, field):
    """Run dense scheme ``steps`` over staged (flat) field tensors."""
    bufs = list(tensors)
    last = 0
    for s in steps:
        bufs[s.i] = apply_dense_step(field, bufs[s.i], bufs[s.j], s)
        bufs[s.j] = None  # free for XLA liveness
        last = s.i
    return bufs[last]


def tensor_contraction(tensors, steps, field=None):
    """Eager convenience wrapper (reference-parity name): numpy in/out,
    logically shaped result."""
    field = field or make_field()
    staged = stage_tensors(field, [__import__("numpy").asarray(t) for t in tensors])
    out = field.unwrap(execute_dense(staged, steps, field))
    return out.reshape(steps[-1].lowered.dims_y)


def slice_select(tensors, slicing_axes, slice_id, num_sliced, field):
    """Select one slice configuration (traceable).

    ``slicing_axes``: list over sliced bonds (MSB-first like the reference's
    ``np.binary_repr`` convention) of entries
    (tensor_id, logical_axis, logical_dims_before, physical_shape_after),
    precomputed by :func:`build_slicing_axes`.
    """
    bufs = list(tensors)
    k = num_sliced
    for x, entries in enumerate(slicing_axes):
        bit = (slice_id >> (k - 1 - x)) & 1
        for tid, ax, dims, phys in entries:
            bufs[tid] = field.index_logical(bufs[tid], dims, ax, bit, phys)
    return bufs


def build_slicing_axes(tensor_bonds, slicing_bonds, batched_tensors=(),
                       bond_dims=None, batch_dim=2):
    """Compute static slice-selection specs for each sliced bond.

    ``tensor_bonds`` is the UNSLICED bond mapping (all bonds present).
    ``batched_tensors``: ids whose payload carries a leading amplitude-batch
    axis (sparse-mode final-qubit tensors).  Each spec entry carries the
    logical dims at selection time, so sequential selections on one tensor
    stay consistent (the reference computes indices against the original
    layout but applies them sequentially — a latent axis-shift bug,
    simulation.py:60-65).
    """
    batched = set(batched_tensors)
    bond_dims = bond_dims or {}
    state = {}
    specs = [[] for _ in slicing_bonds]
    for x, bond in enumerate(slicing_bonds):
        for tid, bonds in tensor_bonds.items():
            if bond in bonds:
                if tid not in state:
                    cur = (["#batch"] if tid in batched else []) + list(bonds)
                    dims = [batch_dim if b == "#batch"
                            else int(bond_dims.get(b, 2)) for b in cur]
                    state[tid] = (cur, dims)
                cur, dims = state[tid]
                ax = cur.index(bond)
                dims_before = tuple(dims)
                cur.pop(ax)
                dims.pop(ax)
                specs[x].append(
                    (tid, ax, dims_before, physical_shape(tuple(dims))))
    return specs


def make_sliced_runner(execute, steps, slicing_axes, num_sliced, output_shape,
                       field, unroll=1, slice_batch=1):
    """Traceable fn: tensors -> sum over slices of ``execute(sliced, steps)``.

    Shared by the dense and sparse paths; the slice loop is a scan so the
    compiled program is O(steps), not O(steps * 2^k).  ``output_shape`` is
    LOGICAL; the accumulator/result use the flat physical form.

    ``slice_batch`` > 1 vmaps that many slices per scan iteration: the many
    small per-step matmuls gain a batch dimension, which is the single
    biggest MXU-utilization lever (measured 12.0s -> 5.8s on the n30
    benchmark at width 8).  Peak memory scales with the width; it must
    divide the slice count (else it silently falls back to 1).
    """
    phys_out = physical_shape(output_shape)

    def run(tensors, slice_ids=None, init=None, weights=None):
        """``weights``: optional per-slice-id scale (used by the mesh path
        to mask padded duplicate ids so every device always participates)."""
        if num_sliced == 0:
            return execute(tensors, steps, field)
        ids = (jnp.arange(2 ** num_sliced, dtype=jnp.int32)
               if slice_ids is None else slice_ids)
        if init is None:
            init = field.zeros(phys_out)
        W = slice_batch if slice_batch > 1 and ids.shape[0] % slice_batch == 0 \
            else 1

        if W == 1:
            def body(acc, sw):
                sid, w = sw
                sliced = slice_select(tensors, slicing_axes, sid, num_sliced,
                                      field)
                part = execute(sliced, steps, field)
                if weights is not None:
                    part = field.scale(part, w)
                return field.add(acc, part), None
            wts = (jnp.ones_like(ids, dtype=jnp.float32)
                   if weights is None else weights)
            acc, _ = lax.scan(body, init, (ids, wts), unroll=unroll)
            return acc

        def one(sid):
            sliced = slice_select(tensors, slicing_axes, sid, num_sliced, field)
            return execute(sliced, steps, field)

        def body(acc, row):
            id_row, w_row = row
            parts = jax.vmap(one)(id_row)
            if weights is not None:
                parts = jax.tree.map(
                    lambda p: p * w_row.reshape((-1,) + (1,) * (p.ndim - 1)),
                    parts)
            summed = (field.sum0(parts) if hasattr(field, "sum0")
                      else jax.tree.map(lambda p: p.sum(0), parts))
            return field.add(acc, summed), None

        wts = (jnp.ones_like(ids, dtype=jnp.float32)
               if weights is None else weights)
        acc, _ = lax.scan(body, init, (ids.reshape(-1, W), wts.reshape(-1, W)),
                          unroll=unroll)
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
