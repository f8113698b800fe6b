"""Operating-point sweep for the n30 m14 sparse bench: plan x mode x width.

Usage: python scripts/sweep.py PLAN MODE WIDTH [ALGO] [STORAGE]
Prints one line: plan mode width wall_s roofline_s compile_s maxrel
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_CIRCUIT = "/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py"
REF_AMPLITUDES = "/root/reference/examples/amplitudes_n30_m14_s0_e0_pEFGH_10000.txt"


def main():
    plan, mode, width = sys.argv[1], sys.argv[2], int(sys.argv[3])
    algo = sys.argv[4] if len(sys.argv) > 4 else "naive"
    storage = sys.argv[5] if len(sys.argv) > 5 else "f32"
    n_bits = int(os.environ.get("SWEEP_BITS", "1000"))

    import jax
    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime.executor import (
        build_slicing_axes, make_sliced_runner, stage_tensors)
    from artensor_tpu.runtime.sparse import (
        contraction_scheme_sparse, execute_sparse)
    from artensor_tpu.runtime import metrics as mt

    gt = {}
    with open(REF_AMPLITUDES) as f:
        for line in f:
            p = line.split()
            if len(p) == 3:
                gt[p[0]] = float(p[1]) + 1j * float(p[2])
    bitstrings = list(gt.keys())[:n_bits]

    n, layers = load_cirq_circuit(REF_CIRCUIT)
    circ = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")

    order, sliced, ctree = plan_io.load_plan(plan)
    import re as _re
    sc = int(_re.search(r"sc(\d+)", plan).group(1))
    steps, out_bonds, bits_sorted = contraction_scheme_sparse(
        ctree, bitstrings, sc_target=sc,
        lane_schedule=not os.environ.get("SWEEP_NOLANE"))
    field = make_field(np.complex64, "highest", mode, algo, storage)
    staged = stage_tensors(field, [ntn.tensors[i] for i in range(len(ntn.tensors))])
    axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2)
    k = len(sliced)
    run = jax.jit(make_sliced_runner(
        execute_sparse, steps, axes, k, (len(bits_sorted),), field,
        slice_batch=width))

    def once():
        t0 = time.time()
        r = run(staged)
        if mode == "fused":
            amps = field.unwrap(r)
        else:
            amps = np.asarray(r[0]) + 1j * np.asarray(r[1])
        return time.time() - t0, amps

    try:
        compile_s, amps = once()
    except Exception as e:
        print(f"{plan} {mode} w{width} {algo} {storage} FAIL {type(e).__name__}: "
              f"{str(e)[:120]}")
        return
    walls = []
    for _ in range(3):
        w, amps = once()
        walls.append(w)
    wall = float(np.median(walls))
    rel = np.array([abs(a - gt[b]) / abs(gt[b]) for a, b in zip(amps, bits_sorted)])
    roofline = (2 ** k) * mt.scheme_roofline_seconds(steps)
    print(f"{plan} {mode} w{width} {algo} {storage} wall={wall:.3f}s "
          f"roofline={roofline:.2f}s compile={compile_s:.1f}s "
          f"maxrel={rel.max():.1e} ok={(rel <= 0.05).mean():.3f}")


if __name__ == "__main__":
    main()
