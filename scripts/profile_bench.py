"""Capture + parse a device profile of one w128 bench iteration.

Writes a jax profiler trace of the compiled sparse runner, then parses the
perfetto trace.json.gz to aggregate device time by op category — the
op-level truth about where the 2x-over-roofline goes.

Usage: python scripts/profile_bench.py [plan] [width] [nbits]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

os.environ.setdefault("ARTENSOR_TPU_CACHE", os.path.abspath(".jax_cache"))
from artensor_tpu.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

PLAN = sys.argv[1] if len(sys.argv) > 1 else "plans/n30_m14_sparse_sc22.json"
WIDTH = int(sys.argv[2]) if len(sys.argv) > 2 else 128
NBITS = int(sys.argv[3]) if len(sys.argv) > 3 else 1000


def main():
    import jax

    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime.executor import (
        build_slicing_axes, make_sliced_runner, stage_tensors)
    from artensor_tpu.runtime.sparse import (
        contraction_scheme_sparse, execute_sparse)

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
    from artensor_tpu.runtime.scheme_cache import cached_scheme_sparse
    steps, ob, bs = cached_scheme_sparse(PLAN, ctree, bits, sc_target=sc)
    print("# kernel steps:", sum(1 for s in steps if s.lane is not None))
    field = make_field(np.complex64, "highest", "split")
    axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2)
    from artensor_tpu.runtime.executor import precompute_static_steps
    steps, host_arrays = precompute_static_steps(
        steps, [ntn.tensors[i] for i in range(len(ntn.tensors))], axes)
    staged = jax.device_put(stage_tensors(field, host_arrays))
    k = len(sliced)
    run = jax.jit(make_sliced_runner(
        execute_sparse, steps, axes, k, (len(bs),), field,
        slice_batch=WIDTH))
    tdir = "/tmp/gk_profile"
    os.system(f"rm -rf {tdir}")
    os.makedirs(tdir, exist_ok=True)
    compiled = run.lower(staged).compile()   # warm (compile)
    try:
        # the optimized module of THIS executable: op names align with
        # the trace events, so times join to source lines (/tmp/attrib)
        with open(os.path.join(tdir, "optimized.txt"), "w") as f:
            f.write(compiled.as_text())
    except Exception as e:  # pragma: no cover
        print("# as_text failed:", e, file=sys.stderr)
    r = compiled(staged)
    _ = np.asarray(r[0][:1])
    with jax.profiler.trace(tdir):
        r = run(staged)
        _ = np.asarray(r[0][:1])

    # parse perfetto trace
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert paths, os.popen(f"find {tdir} -type f | head").read()
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    # device-thread events: aggregate by op-name prefix
    by_cat = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        args = ev.get("args") or {}
        pid_name = str(ev.get("pid", ""))
        # heuristics: device op events carry 'run_id'/hlo args or appear
        # under TensorFlow-op-less threads; keep everything and bucket
        dur = ev.get("dur", 0) / 1e6
        if not name or dur <= 0:
            continue
        low = name.lower()
        if "fusion" in low:
            cat = "fusion"
        elif "dot" in low or "convolution" in low:
            cat = "dot"
        elif "custom-call" in low or "tpu_custom_call" in low:
            cat = "pallas"
        elif "copy" in low or "transpose" in low:
            cat = "copy/transpose"
        elif "gather" in low or "dynamic-slice" in low:
            cat = "gather/slice"
        elif "reduce" in low or "add" in low or "scatter" in low:
            cat = "reduce/add"
        else:
            cat = "other"
        if args.get("device_type") == "TPU" or True:
            by_cat[(pid_name, cat)] += dur
            by_name[name[:70]] += dur
            total += dur
    print("\n== by (pid, category), seconds ==")
    for kk, v in sorted(by_cat.items(), key=lambda x: -x[1])[:14]:
        print(f"  {kk}: {v:.4f}")
    print("\n== top ops ==")
    for kk, v in sorted(by_name.items(), key=lambda x: -x[1])[:25]:
        print(f"  {v:8.4f}s {kk}")


if __name__ == "__main__":
    main()
