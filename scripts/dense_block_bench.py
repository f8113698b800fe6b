"""Time the dense n30 output-block walk (BASELINE config 2) on the chip.

Walks the first N of 64 blocks of the 2^30 state through
contraction_output_blocks (with the round-3 kernel-scheduled dense
scheme) and reports s/block — the round-2 measurement was ~1.4 s/block
(87 s execution for all 64).

Usage: python scripts/dense_block_bench.py [n_blocks=4]
"""

import sys
import time

sys.path.insert(0, ".")
import numpy as np  # noqa: E402
import os  # noqa: E402
os.environ.setdefault("ARTENSOR_TPU_CACHE", os.path.abspath(".jax_cache"))
from artensor_tpu.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()


def main():
    import jax
    import jax.numpy as jnp

    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime import scheme as sch
    from artensor_tpu.runtime.executor import (
        build_slicing_axes, execute_dense, make_sliced_runner, stage_tensors)

    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n, layers = load_cirq_circuit(
        "/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py")
    circ = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("normal")
    order, sliced, ctree = plan_io.load_plan(
        "plans/n30_m14_dense_blocks64_sc26.json")
    steps, out_bonds = sch.contraction_scheme(ctree)
    nk = sum(1 for s in steps if s.lane is not None)
    print(f"# scheme: {len(steps)} steps, {nk} kernel steps")
    # the plan was built by prepare_output_sharded: the 6 chosen output
    # legs were REMOVED before planning; slice-select them from the full
    # network (mirrors simulation._dense_shard_setup)
    from artensor_tpu.simulation import _bond_sort_key, get_bond_tensors
    bt = get_bond_tensors(tb2)
    open_bonds = sorted((b for b, ts in bt.items() if len(ts) == 1),
                        key=_bond_sort_key)
    chosen = open_bonds[:6]
    axes = build_slicing_axes(tb2, chosen + sliced, bond_dims=ntn.bond_dims)
    k = 6 + len(sliced)
    field = make_field(np.complex64, "highest", "split")
    from artensor_tpu.runtime.executor import precompute_static_steps
    steps, host_arrays = precompute_static_steps(
        steps, [ntn.tensors[i] for i in range(len(ntn.tensors))], axes)
    print(f"# folded to {len(steps)} device steps", flush=True)
    staged = jax.device_put(stage_tensors(field, host_arrays))
    run = jax.jit(make_sliced_runner(
        execute_dense, steps, axes, k, (2,) * len(out_bonds), field))
    # norm reduced ON DEVICE: pulling a 2^24-element block through the
    # tunnel measures the tunnel (~1.6 MB/s), not the chip
    @jax.jit
    def block_norm(ids):
        r = run(staged, ids)
        return (r[0].astype(jnp.float64) ** 2).sum()             + (r[1].astype(jnp.float64) ** 2).sum()

    norm = 0.0
    times = []
    t0 = time.time()
    for blk in range(n_blocks):
        ids = jnp.asarray([blk], dtype=jnp.int32)
        norm += float(block_norm(ids))
        t1 = time.time()
        times.append(t1 - t0)
        t0 = t1
        print(f"block {blk}: {times[-1]:.2f}s (norm so far {norm:.6f}, "
              f"expect ~{(blk + 1) / 64:.4f} avg)", flush=True)
    if len(times) > 1:
        steady = float(np.median(times[1:]))
        print(f"steady-state {steady:.2f} s/block -> "
              f"{steady * 64:.0f} s for the full 2^30 state "
              f"(round 2: ~87 s execution = 1.4 s/block)")


if __name__ == "__main__":
    main()
