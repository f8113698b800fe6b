"""Per-segment XLA memory analysis of the n53 segmented executor.

Compiles each 64-step segment program of the committed n53 sc24 scheme
at the given widths and prints XLA's own argument/output/temp bytes —
the ground truth behind the batch-4 device OOM that the at-width peak
MODEL passes (modeled 1.6 GiB at w4; the 15.75 GB chip refused it).
VERDICT r4 item 5: make the audit predict the working width first try.

Compile-only (AOT lower+compile on ShapeDtypeStructs): nothing runs.

Usage: python scripts/n53_mem.py [w1,w2,...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

WIDTHS = [int(w) for w in (sys.argv[1] if len(sys.argv) > 1
                           else "2,4").split(",")]


def main():
    import jax

    from artensor_tpu import plan_io
    from artensor_tpu.cache import enable_compile_cache
    from artensor_tpu.circuits import TensorNetworkCircuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime import metrics
    from artensor_tpu.runtime.executor import (
        build_slicing_axes, precompute_static_steps, slice_select,
        stage_tensors)
    from artensor_tpu.runtime.scheme_cache import cached_scheme_sparse
    from artensor_tpu.runtime.segmented import (
        _segment_io, apply_sparse_step)

    enable_compile_cache()
    plan = "plans/n53_m20_sparse_sc24.json"
    circ = TensorNetworkCircuit(
        "/root/reference/examples/circuits/"
        "circuit_n53_m20_s0_e0_pABCDCDAB.qsim")
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    order, sliced, ctree = plan_io.load_plan(plan)
    rng = np.random.default_rng(0)
    bits = sorted({"".join(map(str, row))
                   for row in rng.integers(0, 2, size=(1000, circ.n))})
    steps, ob, bs = cached_scheme_sparse(plan, ctree, bits, sc_target=24,
                                         lane_max_steps=10000)
    axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2,
                              bond_dims=ntn.bond_dims)
    k = len(sliced)
    field = make_field(np.complex64, "highest", "split")
    steps, host_arrays = precompute_static_steps(
        steps, [ntn.tensors[i] for i in range(len(ntn.tensors))], axes)
    staged = stage_tensors(field, host_arrays)

    # shapes after slice_select at width W: trace it abstractly
    def select_w(ts, W):
        sids = np.arange(W, dtype=np.int32)
        return jax.eval_shape(
            lambda t, s: jax.vmap(lambda q: slice_select(
                t, axes, q, k, field))(s), list(ts), sids)

    segment_steps = 64
    segments = [list(steps[i:i + segment_steps])
                for i in range(0, len(steps), segment_steps)]
    io, final_id = _segment_io(segments, None)

    for W in WIDTHS:
        sliced_sh = select_w(staged, W)
        shapes = {i: s for i, s in enumerate(sliced_sh)}
        model = metrics.scheme_peak_bytes_at_width(steps, W, axes)
        print(f"-- width {W}: model total {model/2**30:.2f} GiB")
        worst = 0
        for si, (seg, (inputs, outputs)) in enumerate(zip(segments, io)):
            def fn(*arrays, seg=seg, inputs=tuple(inputs),
                   outputs=tuple(outputs)):
                local = dict(zip(inputs, arrays))
                for st in seg:
                    local[st.i] = apply_sparse_step(
                        field, local[st.i], local[st.j], st)
                    local[st.j] = None
                return tuple(local[t] for t in outputs)
            donate = tuple(kk for kk, t in enumerate(inputs)
                           if t not in outputs)
            vf = jax.jit(jax.vmap(fn) if W > 1 else fn,
                         donate_argnums=donate)
            args = [shapes[t] for t in inputs]
            try:
                compiled = vf.lower(*args).compile()
                ma = compiled.memory_analysis()
                arg, out, tmp = (ma.argument_size_in_bytes,
                                 ma.output_size_in_bytes,
                                 ma.temp_size_in_bytes)
                alias = getattr(ma, "alias_size_in_bytes", 0)
                held = sum(
                    int(np.prod(leaf.shape)) * leaf.dtype.itemsize
                    for t, s in shapes.items()
                    if t not in inputs and s is not None
                    for leaf in jax.tree.leaves(s))
                peak = arg + out + tmp - alias
                worst = max(worst, peak + held)
                print(f"  seg {si:2d} ({len(seg):3d} steps): args "
                      f"{arg/2**30:6.2f} out {out/2**30:6.2f} temp "
                      f"{tmp/2**30:6.2f} alias {alias/2**30:5.2f} | held "
                      f"{held/2**30:5.2f} GiB")
                outs = jax.eval_shape(vf, *args)
                for t, s in zip(outputs, outs):
                    shapes[t] = s
                for t in inputs:
                    if t not in outputs:
                        shapes[t] = None
            except Exception as e:
                print(f"  seg {si:2d}: COMPILE FAILED: "
                      f"{str(e).splitlines()[0][:140]}")
                break
        print(f"  worst segment peak+held: {worst/2**30:.2f} GiB")


if __name__ == "__main__":
    main()
