"""Decompose the estimator's narrow-width gap: run the SAME scheme at
several slice-vmap widths and report wall per slice-set vs the model.

The wall estimate models per-step cost as
    max(kernel/XLA step time) + STEP_OVERHEAD_W1_S / width
but measured gaps grow with per-slice tensor size (sc22: 1.6x at w128,
sc25: 3.9x at w16 — docs/BENCH_NOTES.md).  Sweeping width on one scheme
separates the width-amortized overhead (slope vs 1/width) from a
per-batch byte-proportional term (slope vs width x bytes).

Usage: python scripts/width_sweep.py [plan] [widths...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

os.environ.setdefault("ARTENSOR_TPU_CACHE",
                      os.path.abspath(os.path.join(
                          os.path.dirname(__file__), "..", ".jax_cache")))
from artensor_tpu.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

REF_CIRCUIT = "/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py"
REF_AMPS = "/root/reference/examples/amplitudes_n30_m14_s0_e0_pEFGH_10000.txt"


def main():
    import jax

    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime import metrics as mt
    from artensor_tpu.runtime.executor import (build_slicing_axes,
                                               make_sliced_runner,
                                               stage_tensors)
    from artensor_tpu.runtime.sparse import (contraction_scheme_sparse,
                                             execute_sparse)

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    record_path = None
    for a in sys.argv[1:]:
        if a.startswith("--record="):
            record_path = a.split("=", 1)[1]
    plan = args[0] if args else "plans/n30_m14_sparse_sc22.json"
    widths = [int(a) for a in args[1:]]

    with open(REF_AMPS) as f:
        bitstrings = [ln.split()[0] for ln in f if ln.strip()][:1000]
    n, layers = load_cirq_circuit(REF_CIRCUIT)
    circ = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    order, sliced, ctree = plan_io.load_plan(plan)
    sc = float(plan.rsplit("sc", 1)[1].split("_")[0].split(".")[0])
    from artensor_tpu.runtime.scheme_cache import cached_scheme_sparse
    steps, ob, bits_sorted = cached_scheme_sparse(
        plan, ctree, bitstrings, sc_target=sc)
    k = len(sliced)
    axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2)
    from artensor_tpu.runtime.executor import precompute_static_steps
    steps, host_arrays = precompute_static_steps(
        steps, [ntn.tensors[i] for i in range(len(ntn.tensors))], axes)
    est, w_est, peak = mt.scheme_wall_estimate(steps, k, slicing_axes=axes)
    print(f"plan={plan} k={k} est={est:.3f}s@w{w_est} "
          f"steps={len(steps)} peak={peak / 1e9:.2f}GB/slice")
    if not widths:
        widths = sorted({w for w in (1, 2, 4, 8, 16, 32, 64, 128)
                         if w <= min(2 ** k, w_est)})
    kern_s, xla_s, bytes_ps, n_steps = mt.scheme_wall_components(steps)
    record = {"plan": plan, "k": k, "kern_s": kern_s, "xla_s": xla_s,
              "bytes_per_slice": bytes_ps, "n_steps": n_steps,
              "points": []}
    field = make_field(np.complex64, "highest", "split")
    staged = stage_tensors(field, host_arrays)
    staged = jax.device_put(staged)
    for w in widths:
        if (2 ** k) % w:
            continue
        run = jax.jit(make_sliced_runner(
            execute_sparse, steps, axes, k, (len(bits_sorted),), field,
            slice_batch=w))
        t0 = time.time()
        r = jax.block_until_ready(run(staged))
        _ = np.asarray(r[0][:1])            # force readback sync
        compile_s = time.time() - t0
        walls = []
        for _ in range(3):
            t0 = time.time()
            r = jax.block_until_ready(run(staged))
            _ = np.asarray(r[0][:1])
            walls.append(time.time() - t0)
        wall = float(np.median(walls))
        e, _, _ = mt.scheme_wall_estimate(steps, k,
                                          hbm_budget_bytes=peak * w * 1.01)
        print(json.dumps({"width": w, "wall_s": round(wall, 3),
                          "est_s": round(e, 3),
                          "gap_s": round(wall - e, 3),
                          "compile_s": round(compile_s, 1)}), flush=True)
        record["points"].append({"width": w, "wall_s": wall})
        if record_path:           # append-after-every-point: a crash or
            with open(record_path, "w") as f:  # OOM keeps earlier widths
                json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
