"""Multi-chip distribution over a jax device mesh.

The tensor-network workload has two embarrassingly-parallel axes (there is
no NCCL/MPI analogue in the reference — multi-GPU runs were out-of-band
processes; see SURVEY.md §2.9):

  'slice' : the 2^k sliced sub-contractions (identical shapes, summed) —
            sharded with shard_map, accumulated with lax.psum over ICI.
  'batch' : independent groups of bitstring amplitudes (sparse mode) —
            each group has its own gather plan, so groups are dispatched as
            separate device programs host-side (see dispatch_batches).

All collectives are XLA collectives over the mesh; on a real pod the
'slice' axis should map to ICI-adjacent devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.field import make_field
from ..runtime.executor import execute_dense, make_sliced_runner
from ..runtime.lowering import physical_shape


def make_mesh(n_devices=None, axis_name="slice", devices=None):
    """1-D device mesh over the first ``n_devices`` available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def _tensor_specs(tensors, spec):
    """One PartitionSpec per field-tensor leaf (pairs for SplitField)."""
    return tuple(
        tuple(spec for _ in t) if isinstance(t, tuple) else spec
        for t in tensors
    )


def run_sliced_contraction(tensors, steps, slicing_axes, num_sliced,
                           output_shape, mesh, field=None,
                           execute=execute_dense, axis_name="slice"):
    """Shard the 2^k slice ids across ``mesh``; psum partial accumulators.

    Every device runs the same compiled scan over its local slice-id chunk;
    one psum over ICI combines the partials.  Result is replicated.
    ``execute`` selects the per-slice executor (dense or sparse).
    """
    field = field or make_field()
    n_dev = int(np.prod(mesh.devices.shape))
    total = 2 ** num_sliced
    run = make_sliced_runner(
        execute, steps, slicing_axes, num_sliced, output_shape, field)
    if num_sliced == 0 or n_dev == 1:
        return jax.jit(run)(list(tensors))

    # pad the slice-id grid so EVERY device always participates: repeated
    # ids are masked to zero contribution (never silently fall back to one
    # device when 2^k % n_dev != 0)
    per_dev = -(-total // n_dev)
    padded = np.arange(n_dev * per_dev, dtype=np.int32)
    mask = (padded < total).astype(np.float32)
    ids = jnp.asarray(np.minimum(padded, total - 1).reshape(n_dev, per_dev))
    masks = jnp.asarray(mask.reshape(n_dev, per_dev))

    def worker(local_ids, local_mask, *arrays):
        # the accumulator varies per device (different slice chunks):
        # mark it varying over the mesh axis for the scan carry
        init = field.pvary(field.zeros(physical_shape(output_shape)), axis_name)
        partial_acc = run(list(arrays), local_ids.reshape(-1), init=init,
                          weights=local_mask.reshape(-1))
        return field.psum(partial_acc, axis_name)

    shard = jax.shard_map(
        worker,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)) + _tensor_specs(tensors, P()),
        out_specs=_tensor_specs([tensors[0]], P())[0],
    )
    return jax.jit(shard)(ids, masks, *tensors)


def run_output_sharded(tensors, steps, slicing_axes, d_out, k_sum,
                       local_output_shape, mesh, field=None,
                       execute=execute_dense, axis_name="slice"):
    """Dense full-amplitude contraction with the OUTPUT sharded over the mesh.

    The first ``d_out`` entries of ``slicing_axes`` select open output legs:
    each assignment of those legs yields a DISJOINT block of the full
    amplitude tensor, so blocks are computed on different devices and
    concatenated (sharded on axis 0), never summed.  The remaining ``k_sum``
    sliced bonds are genuine memory slices, scanned and accumulated per
    block as usual.  This is how a 2^30-amplitude Sycamore output that
    cannot fit one chip's HBM spreads over a pod (each device holds
    2^(30-d_out) amplitudes; reference analogue: the notebook's monolithic
    full-state contraction, /root/reference/examples/sycamore.ipynb cell 5).

    Returns the global array: logical shape (2**d_out,) + local_output_shape,
    sharded over the mesh on axis 0.
    """
    field = field or make_field()
    n_dev = int(np.prod(mesh.devices.shape))
    total_out = 2 ** d_out
    assert total_out % n_dev == 0, "output blocks must divide the mesh"
    run = make_sliced_runner(
        execute, steps, slicing_axes, d_out + k_sum, local_output_shape, field)
    out_ids = jnp.arange(total_out, dtype=jnp.int32).reshape(
        n_dev, total_out // n_dev)

    def worker(dev_out_ids, *arrays):
        def one(oid):
            ids = oid * (2 ** k_sum) + jnp.arange(2 ** k_sum, dtype=jnp.int32)
            # the accumulator differs per device: mark it mesh-varying
            init = field.pvary(
                field.zeros(physical_shape(local_output_shape)), axis_name)
            return run(list(arrays), ids, init=init)
        return jax.lax.map(one, dev_out_ids.reshape(-1))

    shard = jax.shard_map(
        worker,
        mesh=mesh,
        in_specs=(P(axis_name),) + _tensor_specs(tensors, P()),
        out_specs=_tensor_specs([tensors[0]], P(axis_name))[0],
    )
    return jax.jit(shard)(out_ids, *tensors)


def dispatch_batches(make_runner, batch_plans, devices=None):
    """Host-level second parallel axis: run per-batch-group programs on
    different devices concurrently (sparse mode groups have different static
    gather plans, so they are distinct XLA programs by construction —
    'batch' is the second shardable axis besides 'slice', SURVEY.md §2.9 P3).

    ``make_runner(plan) -> callable(device)``: builds the jitted program for
    one group and runs it with inputs placed on ``device``.  ALL groups are
    dispatched before any result is awaited — jax dispatch is async, so the
    device queues fill and execute concurrently; blocking happens only in
    the final gather.
    """
    if devices is None:
        devices = jax.devices()
    pending = []
    for g, plan in enumerate(batch_plans):
        dev = devices[g % len(devices)]
        runner = make_runner(plan)
        with jax.default_device(dev):
            pending.append(runner(dev))          # async: returns futures
    return [jax.block_until_ready(r) for r in pending]
