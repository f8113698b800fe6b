"""Probe: what RGBlk forms does the planner pick on the committed bench
plans, before and after the width rescreen?  Host-only (no device work).

Usage: python scripts/probe_blk.py [plan] [n_bits]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from artensor_tpu import plan_io  # noqa: E402
from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit  # noqa: E402
from artensor_tpu.network import NumericalTensorNetwork  # noqa: E402
from artensor_tpu.runtime.executor import build_slicing_axes, precompute_static_steps  # noqa: E402
from artensor_tpu.runtime.gatherk import GGKPlan, RGRow  # noqa: E402
from artensor_tpu.runtime.metrics import choose_slice_width, scheme_wall_estimate  # noqa: E402
from artensor_tpu.runtime.scheme_cache import cached_scheme_sparse  # noqa: E402

REF_CIRCUIT = "/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py"
REF_AMPLITUDES = "/root/reference/examples/amplitudes_n30_m14_s0_e0_pEFGH_10000.txt"


def main():
    plan = sys.argv[1] if len(sys.argv) > 1 else "plans/n30_m14_sparse_sc22_r2.json"
    n_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    gt = []
    with open(REF_AMPLITUDES) as f:
        for line in f:
            p = line.split()
            if len(p) == 3:
                gt.append(p[0])
    bitstrings = gt[:n_bits]

    n, layers = load_cirq_circuit(REF_CIRCUIT)
    circ = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    order, sliced, ctree = plan_io.load_plan(plan)
    m = re.search(r"sc(\d+)", plan)
    sc_t = float(m.group(1)) if m else 22.0
    steps, out_bonds, bits_sorted = cached_scheme_sparse(
        plan, ctree, bitstrings, sc_target=sc_t)
    axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2)
    steps, _ = precompute_static_steps(
        steps, [ntn.tensors[i] for i in range(len(ntn.tensors))], axes)

    def show(tag):
        print(f"--- {tag} ---")
        tot = 0.0
        for k, s in enumerate(steps):
            lane = getattr(s, "lane", None)
            est = getattr(lane, "est_s", 0.0) if lane is not None else 0.0
            tot += est or 0.0
            if isinstance(lane, GGKPlan) and isinstance(lane.row, RGRow):
                row = lane.row
                blk = lane.blk
                F = row.view_x[0] if len(row.view_x) == 2 else 1
                desc = (f"blk R={blk.R} G={blk.G} nsb={blk.n_super}"
                        if blk is not None else "row")
                print(f"  step {k}: B={lane.B} F={F} K={row.K} H={row.H} "
                      f"bi={lane.bi_rows} bj={lane.bj_rows} -> {desc}  "
                      f"est={lane.est_s * 1e3:.3f} ms "
                      f"(row_est={lane.row_est_s * 1e3 if lane.row_est_s else -1:.3f})")
        print(f"  sum kern est {tot * 1e3:.2f} ms/slice")
        est, w, peak = scheme_wall_estimate(steps, len(sliced),
                                            slicing_axes=axes)
        print(f"  wall est {est:.3f} s  width {w}  peak {peak / 2**30:.2f} GiB")
        return w

    show("as planned (GGK_WIDTH_ASSUME screen)")
    w = choose_slice_width(steps, len(sliced), slicing_axes=axes)
    print(f"choose_slice_width -> {w}")
    show(f"after rescreen at width {w}")


if __name__ == "__main__":
    main()
