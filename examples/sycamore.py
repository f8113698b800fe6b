"""Sycamore n30 m14 end-to-end: the reference notebook's flow as a script.

Reproduces examples/sycamore.ipynb of the reference repo (plan -> contract
-> validate against Google's Schrodinger-Feynman amplitudes) on TPU.

Usage:
    python examples/sycamore.py --bitstrings 1000 [--plan plans/n30_m14_sparse_sc24.json]

Requires the reference data files (circuit + ground-truth amplitudes); set
--circuit/--amplitudes to their locations.
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--circuit",
                   default="/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py")
    p.add_argument("--amplitudes",
                   default="/root/reference/examples/amplitudes_n30_m14_s0_e0_pEFGH_10000.txt")
    p.add_argument("--plan",
                   default=os.path.join(REPO, "plans/n30_m14_sparse_sc24.json"))
    p.add_argument("--bitstrings", type=int, default=1000)
    p.add_argument("--sc-target", type=float, default=24.0)
    args = p.parse_args()

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.runtime.metrics import ContractionReport
    from artensor_tpu.simulation import TensorNetworkSimulation, PlannerConfig

    gt = {}
    with open(args.amplitudes) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 3:
                gt[parts[0]] = float(parts[1]) + 1j * float(parts[2])
    bitstrings = list(gt.keys())[:args.bitstrings]
    print(f"targets: {len(bitstrings)} bitstrings")

    circ = TensorNetworkCircuit(load_cirq_circuit(args.circuit))
    sim = TensorNetworkSimulation.from_circuit(circ, bitstrings)
    t0 = time.time()
    if args.plan:
        order, sliced, ctree = plan_io.load_plan(args.plan)
        sim.config = PlannerConfig(sc_target=args.sc_target)
        sim.order, sim.slicing_bonds, sim.ctree = order, sliced, ctree
        sim._compile_scheme()
        print(f"loaded plan {args.plan}: {len(sliced)} sliced bonds "
              f"({2**len(sliced)} slices), compiled scheme in {time.time()-t0:.1f}s")
    else:
        sim.prepare_contraction(PlannerConfig(sc_target=args.sc_target, trials=8))
        tc, sc, _ = sim.ctree.complexity()
        print(f"planned in {time.time()-t0:.1f}s: tc={tc:.2f} sc={sc}")

    report = ContractionReport()
    amps = sim.contraction(dtype=np.complex64, report=report)
    print(report.summary())

    rel = np.array([abs(a - gt[b]) / abs(gt[b])
                    for a, b in zip(amps, sim.bitstrings_sorted)])
    frac = float((rel <= 0.05).mean())
    print(f"validation vs Google SFA: {frac*100:.2f}% within 5% "
          f"(max rel {rel.max():.2e}, mean {rel.mean():.2e})")
    sys.exit(0 if frac == 1.0 else 1)


if __name__ == "__main__":
    main()
