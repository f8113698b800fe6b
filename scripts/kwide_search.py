"""K-portfolio plan search: trade flops for MXU contraction width.

The roofline SA converges to K in {8..32} trees (flop-optimal, MXU
<= 25% by construction).  This sweep biases the native SA's MXU
discount via RoofParams.k_full (node rate *= min(1, K / k_full)): at
k_full > 128 small-K steps look slower than the chip runs them, pushing
the search toward wide-K junctions the pair/GGK kernels execute at full
MXU width.  Candidates are re-scored by the CALIBRATED wall estimate
(which uses the real k_full = 128), so the bias only shapes the search,
not the ranking.  Best candidates are saved for chip A/B.

Usage: python scripts/kwide_search.py [seeds=4] [iters=60]
Env: KF="512,2048" (k_full grid), SC="21,22" (sc grid), TAG="r4"
(plan filename suffix).  Round 5 locates the Pareto KNEE with
KF="128,192,256,384" SC="21,22,23" (the round-4 sweep jumped from the
k_full=128 baseline straight to 512/2048 — VERDICT r4 item 6).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF_N30 = "/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py"
REF_AMPS = "/root/reference/examples/amplitudes_n30_m14_s0_e0_pEFGH_10000.txt"


def k_histogram(steps):
    """Contraction-width histogram of the scheme's non-trivial steps,
    weighted by each step's flops."""
    from artensor_tpu.runtime.lowering import _prod

    hist = {}
    for s in steps:
        lows = [s.lowered] if getattr(s, "lowered", None) is not None \
            else list(getattr(s, "lowered_chunks", ()) or ())
        for low in lows:
            (cx, _), _ = low.dnums
            k = _prod(low.shape_l[d] for d in cx)
            fl = 2.0 * _prod(low.phys_y) * k
            b = 1 << max(0, int(np.log2(max(k, 1))))
            hist[b] = hist.get(b, 0.0) + fl
    tot = sum(hist.values()) or 1.0
    return {k: round(v / tot, 3) for k, v in sorted(hist.items())}


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.planner import find_order
    from artensor_tpu.runtime import metrics as mt
    from artensor_tpu.runtime.sparse import contraction_scheme_sparse

    bits = [l.split()[0] for l in open(REF_AMPS) if len(l.split()) == 3][:1000]
    n, layers = load_cirq_circuit(REF_N30)
    circ = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")

    kf_grid = [int(v) for v in
               os.environ.get("KF", "512,2048").split(",")]
    sc_grid = [int(v) for v in os.environ.get("SC", "21,22").split(",")]
    tag = os.environ.get("TAG", "r4")
    best = {}
    for k_full in kf_grid:
        for sc in sc_grid:
            for seed in range(n_seeds):
                t0 = time.time()
                order, sliced, ctree = find_order(
                    tb2, ntn.bond_dims, final_qubits=fq2,
                    max_bitstrings=1000, sc_target=sc, trials=4,
                    iters=iters,
                    betas=list(np.linspace(3.0, 21.0, 61)),
                    start_seed=10_000 * seed + 7, alpha=0.0,
                    parallel=False, objective="roofline", k_full=k_full)
                steps, _, _ = contraction_scheme_sparse(
                    ctree, bits, sc_target=sc, negotiate=False, fuse=False)
                est, width, peak = mt.scheme_wall_estimate(steps, len(sliced))
                hist = k_histogram(steps)
                wide = sum(v for k, v in hist.items() if k >= 64)
                print(f"kf{k_full} sc{sc} seed{seed}: k={len(sliced)} "
                      f"est={est:.2f}s w={width} peak={peak/1e9:.2f}GB "
                      f"wideK-flops={wide:.0%} hist={hist} "
                      f"({time.time()-t0:.0f}s)", flush=True)
                cur = best.get(k_full)
                if cur is None or est < cur[0]:
                    best[k_full] = (est, wide, ctree, sc)
    print("---- best per k_full:")
    for kf, (est, wide, ctree, sc) in sorted(best.items()):
        path = f"plans/n30_m14_sparse_kf{kf}_sc{sc}_{tag}.json"
        plan_io.save_plan(path, ctree,
                          meta={"rank": "wall-estimate", "k_full": kf,
                                "est_s": round(est, 3),
                                "wide_k_flops": round(wide, 3)})
        print(f"k_full={kf}: est={est:.2f}s wideK={wide:.0%} -> {path}")


if __name__ == "__main__":
    main()
