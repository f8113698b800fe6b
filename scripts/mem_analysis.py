"""Ground-truth HBM peaks from XLA's own buffer assignment.

Compiles the monolithic sliced runner for a plan at a set of widths and
prints ``compiled.memory_analysis()`` — argument/output/temp/peak bytes
as XLA assigned them.  This is the number the at-width peak MODEL
(metrics.scheme_peak_bytes_at_width) is trying to predict; VERDICT r4
item 4 (model said sc22_r2 @ w128 needs 17.0 GB, the 15.75 GB chip runs
it) is settled by comparing the two here.

Compile-only: nothing executes, cached compiles return instantly.

Usage: python scripts/mem_analysis.py [plan] [nbits] [w1,w2,...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

PLAN = sys.argv[1] if len(sys.argv) > 1 else "plans/n30_m14_sparse_sc22_r2.json"
NBITS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
WIDTHS = [int(w) for w in (sys.argv[3] if len(sys.argv) > 3
                           else "64,128").split(",")]


def main():
    import jax

    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime import metrics
    from artensor_tpu.runtime.executor import (
        build_slicing_axes, make_sliced_runner, precompute_static_steps,
        stage_tensors)
    from artensor_tpu.runtime.scheme_cache import cached_scheme_sparse
    from artensor_tpu.runtime.sparse import execute_sparse
    from artensor_tpu.cache import enable_compile_cache

    enable_compile_cache()
    with open("/root/reference/examples/"
              "amplitudes_n30_m14_s0_e0_pEFGH_10000.txt") as f:
        bits = [ln.split()[0] for ln in f if ln.strip()][:NBITS]
    n, layers = load_cirq_circuit(
        "/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py")
    circ = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    order, sliced, ctree = plan_io.load_plan(PLAN)
    sc = float(PLAN.rsplit("sc", 1)[1].split("_")[0].split(".")[0])
    steps, ob, bs = cached_scheme_sparse(PLAN, ctree, bits, sc_target=sc)
    field = make_field(np.complex64, "highest", "split")
    axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2)
    steps, host_arrays = precompute_static_steps(
        steps, [ntn.tensors[i] for i in range(len(ntn.tensors))], axes)
    staged = jax.device_put(stage_tensors(field, host_arrays))
    k = len(sliced)

    for W in WIDTHS:
        run = jax.jit(make_sliced_runner(
            execute_sparse, steps, axes, k, (len(bs),), field,
            slice_batch=W))
        compiled = run.lower(staged).compile()
        ma = compiled.memory_analysis()
        model = metrics.scheme_peak_bytes_at_width(steps, W, axes)
        try:
            arg, out, tmp = (ma.argument_size_in_bytes,
                             ma.output_size_in_bytes,
                             ma.temp_size_in_bytes)
            peak = arg + out + tmp
            print(f"w={W:4d}: XLA args {arg/2**30:6.2f} out {out/2**30:6.2f} "
                  f"temp {tmp/2**30:6.2f} = peak {peak/2**30:6.2f} GiB   "
                  f"| model {model/2**30:6.2f} GiB "
                  f"({model/peak:5.2f}x)")
        except AttributeError:
            print(f"w={W:4d}: memory_analysis -> {ma}  "
                  f"| model {model/2**30:6.2f} GiB")


if __name__ == "__main__":
    main()
