"""n53 kernel-scheduling A/B by DEVICE BUSY TIME, not wall clock.

The segmented path issues ~5 programs per slice batch through the
tunneled TPU; wall-clock rates vary 2-3x run-to-run with tunnel
latency (docs/BENCH_NOTES.md round 4).  This measures what the chip
itself does: one warm slice batch per config under the jax profiler,
summing the XLA Ops thread's busy time.

Usage: python scripts/n53_device_ab.py [width=2]
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

os.environ.setdefault("ARTENSOR_TPU_CACHE", os.path.abspath(".jax_cache"))
from artensor_tpu.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()


def device_busy_s(tdir):
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert paths, tdir
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    dev_pids = set()
    tids = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            if "TPU" in str(ev.get("args", {}).get("name", "")):
                dev_pids.add(ev["pid"])
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            if ev.get("args", {}).get("name") == "XLA Ops":
                tids[ev["pid"]] = ev["tid"]
    # sum TOP-LEVEL (unnested) op durations on the XLA Ops threads
    evs = sorted((e for e in trace["traceEvents"]
                  if e.get("ph") == "X" and e.get("pid") in dev_pids
                  and e.get("tid") == tids.get(e.get("pid"))),
                 key=lambda e: (e["ts"], -e.get("dur", 0)))
    total = 0.0
    top_end = -1
    for e in evs:
        if e["ts"] >= top_end:          # not nested in a previous op
            total += e.get("dur", 0) / 1e6
            top_end = e["ts"] + e.get("dur", 0)
    return total


def main():
    import jax

    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime.executor import (
        build_slicing_axes, precompute_static_steps, stage_tensors)
    from artensor_tpu.runtime.segmented import (
        apply_sparse_step, run_segmented)
    from artensor_tpu.runtime.sparse import contraction_scheme_sparse

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    circ = TensorNetworkCircuit(
        "/root/reference/examples/circuits/"
        "circuit_n53_m20_s0_e0_pABCDCDAB.qsim")
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    order, sliced, ctree = plan_io.load_plan("plans/n53_m20_sparse_sc24.json")
    rng = np.random.default_rng(0)
    bits = sorted({"".join(map(str, row))
                   for row in rng.integers(0, 2, size=(1000, circ.n))})
    for label, lane_max in (("kernels", 10000), ("no-kernels", None)):
        steps, ob, bs = contraction_scheme_sparse(
            ctree, bits, sc_target=24, lane_max_steps=lane_max)
        nk = sum(1 for s in steps if s.lane is not None)
        axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2,
                                  bond_dims=ntn.bond_dims)
        k = len(sliced)
        field = make_field(np.complex64, "highest", "split")
        steps, host = precompute_static_steps(
            steps, [ntn.tensors[i] for i in range(len(ntn.tensors))], axes)
        staged = jax.device_put(stage_tensors(field, host))

        def one_pass(ids):
            acc = run_segmented(staged, steps, axes, k, (len(bs),), field,
                                apply_sparse_step, segment_steps=64,
                                slice_batch=width, slice_ids=ids)
            return np.asarray(field.unwrap(acc)[:1])

        t0 = time.time()
        _ = one_pass(range(width))          # compile + warm
        warm_s = time.time() - t0
        tdir = f"/tmp/n53_prof_{label}"
        os.system(f"rm -rf {tdir}")
        # python tracer OFF: the segmented host loop emits ~1M python
        # events that evict the device events from the trace buffer
        opts = jax.profiler.ProfileOptions()
        opts.python_tracer_level = 0
        opts.host_tracer_level = 1
        jax.profiler.start_trace(tdir, profiler_options=opts)
        try:
            _ = one_pass(range(width, 2 * width))
        finally:
            jax.profiler.stop_trace()
        busy = device_busy_s(tdir)
        print(f"{label}: {nk} kernel steps; warm-batch wall {warm_s:.0f}s; "
              f"DEVICE busy {busy:.2f}s for {width} slices -> "
              f"{busy / width * 1e3:.0f} ms/slice on-chip", flush=True)


if __name__ == "__main__":
    main()
