"""A/B the run-blocked (RGBlk) aligned-step form against the RGRow
kernel on the chip, on the 10k headline's hot step shapes.

Builds the sc22_r2 scheme at the requested batch, picks the GGKPlan
steps, and times each form at a given slice-vmap width with forced
readback (async tunnel makes naive timing meaningless).

Usage: python scripts/rgb_ab.py [n_bits=10000] [width=16] [step ids...]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

os.environ.setdefault("ARTENSOR_TPU_CACHE", os.path.abspath(".jax_cache"))
from artensor_tpu.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

REF_CIRCUIT = "/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py"
REF_AMPS = "/root/reference/examples/amplitudes_n30_m14_s0_e0_pEFGH_10000.txt"
REPS = 20


def main():
    import jax
    from dataclasses import replace

    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime import gatherk as gk
    from artensor_tpu.runtime.gatherk import GGKPlan, apply_ggk_step
    from artensor_tpu.runtime.lowering import _prod
    from artensor_tpu.runtime.sparse import contraction_scheme_sparse

    n_bits = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    want = [int(a) for a in sys.argv[3:]]

    with open(REF_AMPS) as f:
        bits = [ln.split()[0] for ln in f if ln.strip()][:n_bits]
    n, layers = load_cirq_circuit(REF_CIRCUIT)
    circ = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    ntn.simplify("sparse")
    order, sliced, ctree = plan_io.load_plan("plans/n30_m14_sparse_sc22_r2.json")
    steps, ob, bs = contraction_scheme_sparse(ctree, bits, sc_target=22)

    field = make_field(np.complex64, "highest", "split")
    rng = np.random.default_rng(0)

    for k, s in enumerate(steps):
        if s.lane is None or not isinstance(s.lane, GGKPlan):
            continue
        if want and k not in want:
            continue
        plan = s.lane
        row = plan.row
        # operand sizes: X big side, W small side (stored rows x row)
        xrow = _prod(row.view_x) if not hasattr(row, "row_dims") \
            else _prod(row.row_dims)
        wrow = None
        # stored row elements from the scheme's lowered chunks
        low = (s.lowered_chunks or [None])[0]
        ni = _prod(low.shape_l) // len(s.gathers[0][0]) * 0 + 0  # unused
        # build flat operands directly from bi/bj rows
        xcnt = plan.bi_rows * (_prod(row.row_dims)
                               if getattr(row, "row_dims", None) is not None
                               and row.pre_perm is not None
                               else _prod(row.view_x))
        wcnt = plan.bj_rows * row.H * row.K
        # w stored rows are H*K elements pre-wk-gather; use H*K directly
        mk = lambda n_el: (rng.standard_normal((width, n_el), dtype=np.float32),
                           rng.standard_normal((width, n_el), dtype=np.float32))
        xs = tuple(jax.device_put(a) for a in mk(xcnt))
        ws = tuple(jax.device_put(a) for a in mk(wcnt))

        variants = []
        if plan.blk is not None:
            variants.append(("blk", plan))
            variants.append(("row", replace(plan, blk=None,
                                            est_s=plan.est_s)))
        else:
            variants.append(("row", plan))
            blk = gk._plan_rg_block(row, np.asarray(plan.gi),
                                    np.asarray(plan.gj), plan.B,
                                    plan.bj_rows) \
                if isinstance(row, gk.RGRow) else None
            if blk is not None:
                variants.append(("blk", replace(plan, blk=blk)))

        for label, p in variants:
            fn = jax.jit(jax.vmap(
                lambda a, b, c, d: apply_ggk_step(
                    field, (a, b), (c, d), p, interpret=False)[0]))
            t0 = time.time()
            out = fn(xs[0], xs[1], ws[0], ws[1])
            np.asarray(out[0])          # forced readback: the tunnel's
            compile_s = time.time() - t0  # block_until_ready is a no-op
            t0 = time.time()
            for _ in range(REPS):
                out = fn(xs[0], xs[1], ws[0], ws[1])
            np.asarray(out[0])
            per_call = (time.time() - t0) / REPS
            extra = ""
            if p.blk is not None:
                extra = f" R={p.blk.R} nb={p.blk.nb} est_blk={p.blk.est_s*1e3:.2f}ms"
            print(f"#{k} {label:4s}: {per_call*1e3:8.2f} ms/call (w{width}) "
                  f"-> {per_call/width*1e3:6.3f} ms/slice; est {p.est_s*1e3:.2f}"
                  f" compile {compile_s:.0f}s{extra}", flush=True)


if __name__ == "__main__":
    main()
