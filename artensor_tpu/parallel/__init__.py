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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..runtime.executor import make_sliced_contraction


def make_mesh(n_devices=None, axis_name="slice", devices=None):
    """1-D device mesh over the first ``n_devices`` available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def run_sliced_contraction(tensors, steps, slicing_axes, num_sliced,
                           output_shape, mesh, precision="highest",
                           axis_name="slice"):
    """Shard the 2^k slice ids across ``mesh``; psum partial accumulators.

    Every device runs the same compiled scan over its local slice-id chunk;
    one psum over ICI combines the partials.  Result is replicated.
    """
    n_dev = int(np.prod(mesh.devices.shape))
    total = 2 ** num_sliced
    if num_sliced == 0 or n_dev == 1 or total % n_dev != 0:
        run = jax.jit(make_sliced_contraction(
            steps, slicing_axes, num_sliced, output_shape, precision))
        return run(list(tensors))

    ids = jnp.arange(total, dtype=jnp.int32).reshape(n_dev, total // n_dev)
    run = make_sliced_contraction(
        steps, slicing_axes, num_sliced, output_shape, precision)

    def worker(local_ids, *arrays):
        # the accumulator varies per device (different slice chunks):
        # mark it varying over the mesh axis for the scan carry
        init = lax.pvary(
            jnp.zeros(output_shape, dtype=arrays[0].dtype), (axis_name,))
        partial_acc = run(list(arrays), local_ids.reshape(-1), init=init)
        return lax.psum(partial_acc, axis_name)

    shard = jax.shard_map(
        worker,
        mesh=mesh,
        in_specs=(P(axis_name),) + (P(),) * len(tensors),
        out_specs=P(),
    )
    return jax.jit(shard)(ids, *tensors)


def dispatch_batches(make_runner, batch_plans, devices=None):
    """Host-level second parallel axis: run per-batch-group programs on
    different devices concurrently (sparse mode groups have different static
    gather plans, so they are distinct XLA programs by construction).

    ``make_runner(plan) -> callable()`` builds the jitted program for one
    group; dispatch is async (jax returns futures-like arrays), so devices
    overlap.
    """
    if devices is None:
        devices = jax.devices()
    results = []
    for g, plan in enumerate(batch_plans):
        dev = devices[g % len(devices)]
        with jax.default_device(dev):
            results.append(make_runner(plan)())
    return results
