"""Dump the optimized HLO of a bench config's compiled runner.

Forces a fresh compile (separate jax cache dir) with XLA dump flags so
the post-layout-assignment HLO lands in DUMP_DIR — the ground truth for
who demands the layouts behind the pallas-output relayout copies.

Usage: [DUMP_DIR=/tmp/hlo] python scripts/dump_hlo.py [plan] [width] [nbits]
"""

import os
import sys

DUMP = os.environ.get("DUMP_DIR", "/tmp/hlo")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_dump_to={DUMP}"
                           + " --xla_dump_hlo_as_text"
                           + " --xla_dump_hlo_pass_re=.*layout.*")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

PLAN = sys.argv[1] if len(sys.argv) > 1 else "plans/n30_m14_sparse_sc22_r2.json"
WIDTH = int(sys.argv[2]) if len(sys.argv) > 2 else 64
NBITS = int(sys.argv[3]) if len(sys.argv) > 3 else 1000


def main():
    import jax

    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime.executor import (
        build_slicing_axes, make_sliced_runner, precompute_static_steps,
        stage_tensors)
    from artensor_tpu.runtime.scheme_cache import cached_scheme_sparse
    from artensor_tpu.runtime.sparse import execute_sparse

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
    run = jax.jit(make_sliced_runner(
        execute_sparse, steps, axes, k, (len(bs),), field,
        slice_batch=WIDTH))
    print("compiling with dump ->", DUMP, flush=True)
    compiled = run.lower(staged).compile()
    # the axon remote compile helper keeps --xla_dump_to on ITS side;
    # pull the optimized module text from the executable instead
    try:
        txt = compiled.as_text()
        os.makedirs(DUMP, exist_ok=True)
        with open(os.path.join(DUMP, "optimized.txt"), "w") as f:
            f.write(txt)
        print("wrote", os.path.join(DUMP, "optimized.txt"), len(txt))
    except Exception as e:  # pragma: no cover
        print("as_text failed:", e)
    print("done")


if __name__ == "__main__":
    main()
