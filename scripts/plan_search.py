"""Portfolio plan search under the chip-true (K-aware) roofline.

Generates SA plans across seeds and sc_targets (native kernel when
available), scores each candidate by the K-aware scheme roofline
(runtime/metrics.py — contract-width MXU discount + measured HBM rate),
and writes the best plan per sc_target to plans/.

Host-only (planner + scheme compile; no jax device work).

Usage: python scripts/plan_search.py [n30|n53] [seeds] [iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_N30 = "/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py"
REF_AMPS = "/root/reference/examples/amplitudes_n30_m14_s0_e0_pEFGH_10000.txt"


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "n30"
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 60

    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.planner import find_order
    from artensor_tpu.runtime import metrics as mt
    from artensor_tpu.runtime.sparse import contraction_scheme_sparse

    n_bits = int(os.environ.get("N_BITS", "1000"))
    if which == "n30":
        gt = [l.split()[0] for l in open(REF_AMPS) if len(l.split()) == 3]
        bits = gt[:n_bits]
        n, layers = load_cirq_circuit(REF_N30)
        circ = TensorNetworkCircuit((n, layers))
        sc_targets = (21, 22, 23, 24, 25, 26)
        if os.environ.get("SC_TARGETS"):
            sc_targets = tuple(
                int(s) for s in os.environ["SC_TARGETS"].split(","))
    else:
        # bundled pod-scale qsim circuits (n53 m20 / n56 m20 / n60 m24)
        paths = {
            "n53": "/root/reference/examples/circuits/circuit_n53_m20_s0_e0_pABCDCDAB.qsim",
            "n56": "/root/reference/examples/circuits/circuit_n56_m20_s0_e0_pABCDCDAB.qsim",
            "n60": "/root/reference/examples/circuits/circuit_n60_m24_s0_e0_pABCDCDAB.qsim",
        }
        circ = TensorNetworkCircuit(paths[which])
        rng = np.random.default_rng(0)
        bits = ["".join(rng.choice(["0", "1"], circ.n)) for _ in range(1000)]
        sc_targets = (32,)
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")

    best_per_sc = {}
    for sc in sc_targets:
        for seed in range(n_seeds):
            t0 = time.time()
            order, sliced, ctree = find_order(
                tb2, ntn.bond_dims, final_qubits=fq2, max_bitstrings=len(bits),
                sc_target=sc, trials=8, iters=iters,
                betas=list(np.linspace(3.0, 21.0, 61)),
                start_seed=1000 * seed + 1, alpha=0.0, parallel=False)
            # rank by the CALIBRATED wall estimate (kernel est_s +
            # relayout-inflated XLA fallback + per-step overhead amortized
            # by the temp-aware width) — the plain roofline ignores all
            # three and prefers big-slice plans that cannot batch wide.
            # Negotiation off in the sweep (too slow per candidate); the
            # saved finalists recompile WITH it at bench time.
            steps, _, _ = contraction_scheme_sparse(
                ctree, bits, sc_target=sc, negotiate=False, fuse=False)
            est, width, peak = mt.scheme_wall_estimate(steps, len(sliced))
            rf = (2 ** len(sliced)) * mt.scheme_roofline_seconds(steps)
            n_lane = sum(1 for s in steps if s.lane is not None)
            print(f"sc{sc} seed{seed}: k={len(sliced)} est={est:.2f}s "
                  f"(roofline={rf:.2f}s w={width} peak={peak/1e9:.1f}GB) "
                  f"lane={n_lane}/{len(steps)} ({time.time()-t0:.0f}s)",
                  flush=True)
            cur = best_per_sc.get(sc)
            if cur is None or est < cur[0]:
                best_per_sc[sc] = (est, rf, ctree)
    print("---- best per sc_target:")
    overall = None
    for sc, (est, rf, ctree) in sorted(best_per_sc.items()):
        k = len(ctree.tn.sliced)
        print(f"sc{sc}: est={est:.2f}s roofline={rf:.2f}s slices=2^{k}")
        tag = os.environ.get("PLAN_TAG", "r3")
        path = f"plans/{which}_sparse_sc{sc}_{tag}.json" if which != "n30" \
            else f"plans/n30_m14_sparse_sc{sc}_{tag}.json"
        plan_io.save_plan(path, ctree,
                          meta={"rank": "wall-estimate",
                                "est_s": round(est, 3),
                                "roofline_s": round(rf, 3)})
        if overall is None or est < overall[0]:
            overall = (est, path)
    print(f"best overall: {overall[1]} ({overall[0]:.2f}s)")


if __name__ == "__main__":
    main()
