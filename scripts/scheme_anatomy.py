"""Print per-step anatomy of a committed plan's compiled scheme.

For each device step: kind (GK / GGK / RGRow / lane / XLA dot / chunked),
shapes, and every data-movement attachment (plan.pre reorders, wk takes,
pre/post regroups on lowered XLA steps) with its element count — the
host-side census that joins the op-level trace attribution to steps.

Usage: JAX_PLATFORMS=cpu python scripts/scheme_anatomy.py [plan] [nbits]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

PLAN = sys.argv[1] if len(sys.argv) > 1 else "plans/n30_m14_sparse_sc22.json"
NBITS = int(sys.argv[2]) if len(sys.argv) > 2 else 10000


def main():
    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.runtime.executor import build_slicing_axes
    from artensor_tpu.runtime.lowering import _prod
    from artensor_tpu.runtime.scheme_cache import cached_scheme_sparse

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
    axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2)
    from artensor_tpu.runtime.metrics import slice_dynamic_ids
    dyn = slice_dynamic_ids(steps, axes)

    n_move = 0
    for si, s in enumerate(steps):
        lows = [s.lowered] if getattr(s, "lowered", None) is not None \
            else list(getattr(s, "lowered_chunks", ()) or ())
        lane = getattr(s, "lane", None)
        tag = f"[{si:3d}] ({s.i:3d},{s.j:3d}) dyn={'y' if s.i in dyn or s.j in dyn else 'n'}"
        if lane is not None:
            kind = type(lane).__name__
            row = getattr(lane, "row", None)
            bits_ = []
            pre = getattr(lane, "pre", None)
            if pre is not None:
                bits_.append(f"PRE regroup perm={pre.perm} "
                             f"elems={_prod(pre.dims)}")
                n_move += 1
            if row is not None:
                if getattr(row, "pre_perm", None) is not None:
                    bits_.append(f"ROW pre_perm={row.pre_perm} "
                                 f"x_elems={lane.bi_rows*_prod(row.view_x)}")
                    n_move += 1
                idx = row.wk_idx
                ident = bool(np.array_equal(
                    idx.ravel(), np.arange(idx.size)))
                if not ident:
                    bits_.append(f"WK take {idx.size} "
                                 f"(bj={lane.bj_rows})")
                    n_move += 1
                bits_.append(f"view_x={row.view_x} H={row.H} "
                             f"K={getattr(row, 'K', '?')}")
            else:
                idx = getattr(lane, "wk_idx", None)
                if idx is not None and not bool(np.array_equal(
                        np.asarray(idx).ravel(), np.arange(np.asarray(idx).size))):
                    bits_.append(f"WK take {np.asarray(idx).size}")
                    n_move += 1
                vx = getattr(lane, "view_x", None)
                if vx is not None:
                    bits_.append(f"view_x={vx} "
                                 f"H={getattr(lane,'H','?')} K={getattr(lane,'K','?')}")
            print(f"{tag} {kind:8s} " + "; ".join(str(b) for b in bits_))
        else:
            for low in lows:
                pre_i = getattr(low, "reorder_l", None)
                pre_j = getattr(low, "reorder_r", None)
                post = getattr(low, "reorder_y", None)
                moves = []
                for nm, r in (("reL", pre_i), ("reR", pre_j), ("reY", post)):
                    if r is not None:
                        moves.append(f"{nm} perm={getattr(r,'perm',None)} "
                                     f"elems={_prod(r.dims)}")
                        n_move += 1
                kind = "chunked" if getattr(s, "gathers", None) is not None \
                    else "xla"
                shp = (f"L{low.shape_l}xR{low.shape_r}->Y{low.phys_y}")
                print(f"{tag} {kind:8s} {shp} " + "; ".join(moves))
    print(f"\ntotal data-movement attachments: {n_move}")


if __name__ == "__main__":
    main()
