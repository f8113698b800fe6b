"""n53 m20 pod-subtask rate: segmented execution with slice batching.

Round-2 measured 903 ms/slice after 495 s of segment compiles (no slice
batching in the segmented path then).  Round 3 added vmap slice batching
inside run_segmented; this measures the warm rate for a handful of
slices of the committed sc24 subtask plan.

Usage: python scripts/n53_segment_bench.py [n_slices=8] [slice_batch=4]
Env:   N53_LANES=1 raises the kernel-scheduling cutoff so the 454-step
       scheme gets gather-K/pair kernels (41 on the sc24 plan) — the
       segmented path compiles small per-segment programs, so the
       monolithic 400+-step compile-crash class does not apply.
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

    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime.executor import (
        build_slicing_axes, stage_tensors)
    from artensor_tpu.runtime.segmented import (
        apply_sparse_step, run_segmented)
    from artensor_tpu.runtime.sparse import contraction_scheme_sparse

    n_slices = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    circ = TensorNetworkCircuit(
        "/root/reference/examples/circuits/circuit_n53_m20_s0_e0_pABCDCDAB.qsim")
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    order, sliced, ctree = plan_io.load_plan("plans/n53_m20_sparse_sc24.json")
    rng = np.random.default_rng(0)
    bits = ["".join(map(str, row))
            for row in rng.integers(0, 2, size=(1000, circ.n))]
    bits = sorted(set(bits))
    t0 = time.time()
    lane_max = 10000 if os.environ.get("N53_LANES") == "1" else None
    fuse = os.environ.get("N53_FUSE", "1") == "1"
    steps, ob, bs = contraction_scheme_sparse(ctree, bits, sc_target=24,
                                              lane_max_steps=lane_max,
                                              fuse=fuse)
    print(f"# scheme: {len(steps)} steps "
          f"({sum(1 for s in steps if s.lane is not None)} kernel) "
          f"compiled in {time.time()-t0:.0f}s host-side", flush=True)
    axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2,
                              bond_dims=ntn.bond_dims)
    k = len(sliced)
    field = make_field(np.complex64, "highest", "split")
    from artensor_tpu.runtime.executor import precompute_static_steps
    steps, host_arrays = precompute_static_steps(
        steps, [ntn.tensors[i] for i in range(len(ntn.tensors))], axes)
    print(f"# folded to {len(steps)} device steps", flush=True)
    staged = jax.device_put(stage_tensors(field, host_arrays))
    marks = [(0, time.time())]

    def progress(done, total):
        prev_d, prev_t = marks[-1]
        now = time.time()
        marks.append((done, now))
        print(f"  {done}/{total} slices at {now - prev_t:.1f}s "
              f"for the last batch", flush=True)

    seg = int(os.environ.get("N53_SEG", "64"))
    acc = run_segmented(staged, steps, axes, k, (len(bs),), field,
                        apply_sparse_step, segment_steps=seg,
                        slice_batch=width,
                        slice_ids=range(n_slices), progress=progress)
    amps = field.unwrap(acc)          # forces ALL queued device work
    t_end = time.time()
    # dispatch is async: per-batch progress marks only time the enqueue
    # once programs are cached.  The honest steady rate is wall from the
    # END of the first batch (which pays all compiles) to the forced
    # readback, over the slices those batches covered.
    if len(marks) > 2:
        first_done, first_t = marks[1]
        n_after = marks[-1][0] - first_done
        per_slice = (t_end - first_t) / max(1, n_after)
        eff_w = int(marks[2][0] - first_done)
        print(f"steady {per_slice * eff_w:.2f}s per {eff_w}-slice batch -> "
              f"{per_slice * 1e3:.0f} ms/slice forced end-to-end "
              f"(round 2: 903 ms/slice at width 1)")
    assert np.isfinite(amps).all()


if __name__ == "__main__":
    main()
