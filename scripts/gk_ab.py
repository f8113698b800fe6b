"""A/B the round-3 scheme on the chip: kernels vs orders vs vmap.

Variants (same plan, 1000 bitstrings, sc22):
  A  time-ordered scheme, kernels ON,  single slice (no vmap)
  B  time-ordered scheme, kernels OFF (same orders, XLA everywhere)
  C  lane_schedule=False (residual orders, XLA)
  Av time-ordered + kernels, vmap over 8 slices
  Bv kernels off, vmap over 8 slices

Prints per-slice milliseconds for each.  Usage: gk_ab.py [variants...]
"""

import sys
import time

sys.path.insert(0, ".")
import numpy as np  # noqa: E402
import os  # noqa: E402
os.environ.setdefault("ARTENSOR_TPU_CACHE", os.path.abspath(".jax_cache"))
from artensor_tpu.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

PLAN = "plans/n30_m14_sparse_sc22.json"
R = 16


def main():
    import jax
    import jax.numpy as jnp

    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime.executor import (
        build_slicing_axes, slice_select, stage_tensors)
    from artensor_tpu.runtime.sparse import (
        contraction_scheme_sparse, execute_sparse)

    which = sys.argv[1:] or ["A", "B", "C", "Av", "Bv"]
    with open("/root/reference/examples/amplitudes_n30_m14_s0_e0_pEFGH_10000.txt") as f:
        bits = [ln.split()[0] for ln in f if ln.strip()][:1000]
    n, layers = load_cirq_circuit(
        "/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py")
    circ = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    order, sliced, ctree = plan_io.load_plan(PLAN)
    axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2)
    k = len(sliced)
    field = make_field(np.complex64, "highest", "split")
    staged = stage_tensors(field, [ntn.tensors[i] for i in range(len(ntn.tensors))])
    staged = jax.device_put(staged)

    def run_variant(tag, steps, lanes_on, width):
        f2 = make_field(np.complex64, "highest", "split")
        f2.supports_lanes = lanes_on

        def one(ts, sid):
            sl = slice_select(ts, axes, sid, k, f2)
            return execute_sparse(sl, steps, f2)

        if width == 1:
            def prog(ts):
                def body(c, sid):
                    r = one(ts, sid)
                    return c + r[0].sum() + r[1].sum(), None
                c, _ = jax.lax.scan(
                    body, jnp.float32(0),
                    jnp.arange(R, dtype=jnp.int32))
                return c
        else:
            def prog(ts):
                def body(c, sids):
                    r = jax.vmap(lambda s: one(ts, s))(sids)
                    return c + r[0].sum() + r[1].sum(), None
                c, _ = jax.lax.scan(
                    body, jnp.float32(0),
                    jnp.arange(R * width, dtype=jnp.int32).reshape(R, width))
                return c
        jp = jax.jit(prog)
        t0 = time.time()
        _ = float(jp(staged))
        tc = time.time() - t0
        t0 = time.time()
        _ = float(jp(staged))
        per = (time.time() - t0) / (R * width)
        print(f"{tag}: {per * 1e3:8.3f} ms/slice  (compile+1st {tc:.1f}s)",
              flush=True)

    steps_ts = None
    if {"A", "B", "Av", "Bv"} & set(which):
        steps_ts, _, _ = contraction_scheme_sparse(ctree, bits, sc_target=22)
        nk = sum(1 for s in steps_ts if s.lane is not None)
        print(f"# time-ordered scheme: {nk} kernel steps "
              f"/ {len(steps_ts)}", flush=True)
    if "A" in which:
        run_variant("A  ts+kern w1 ", steps_ts, True, 1)
    if "B" in which:
        run_variant("B  ts+xla  w1 ", steps_ts, False, 1)
    if "Av" in which:
        run_variant("Av ts+kern w8 ", steps_ts, True, 8)
    if "Bv" in which:
        run_variant("Bv ts+xla  w8 ", steps_ts, False, 8)
    if "C" in which:
        steps_c, _, _ = contraction_scheme_sparse(
            ctree, bits, sc_target=22, lane_schedule=False)
        run_variant("C  resid    w1", steps_c, False, 1)


if __name__ == "__main__":
    main()
