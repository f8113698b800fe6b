"""The slicing-fidelity experiment: keeping ONE of 2^k slice configs
yields a state of fidelity ~ 1/2^k against the true state.

This is the physics argument for why dynamic slicing is admissible in
approximate random-circuit sampling: each sliced bond halves the kept
amplitude weight, so a spoofer summing a FRACTION of slice configurations
produces exactly that fraction of fidelity — no more.  Reproduces the
reference's notebook cell 7 (/root/reference/examples/sycamore.ipynb):
slice k edges, fix configuration 0, measure fidelity vs the full state.

Usage:
    python examples/sliced_fidelity.py [--circuit path.qsim] [--max-k 3]

Default circuit: the reference's n12 m14 test circuit when available
(CPU-runnable in seconds; the relation is circuit-size independent),
else a generated 12-qubit random circuit.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_N12 = "/root/reference/tests/circuit_n12_m14_s0_e0_pEFGH.qsim"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--circuit", default=None, help=".qsim circuit file")
    p.add_argument("--max-k", type=int, default=3,
                   help="slice up to this many bonds")
    p.add_argument("--sc-target", type=float, default=26.0)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (remote-TPU compile "
                        "roundtrips dominate at these tiny sizes)")
    args = p.parse_args()

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from artensor_tpu import find_order
    from artensor_tpu.circuits import TensorNetworkCircuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime.executor import (
        build_slicing_axes, execute_dense, make_sliced_runner, stage_tensors)
    from artensor_tpu.runtime.scheme import contraction_scheme
    from artensor_tpu.utils.xeb import (
        sliced_fidelity_estimate, state_fidelity)

    if args.circuit:
        circ = TensorNetworkCircuit(args.circuit)
    elif os.path.exists(REF_N12):
        circ = TensorNetworkCircuit(REF_N12)
    else:
        from artensor_tpu.circuits.random_circuits import random_circuit
        circ = TensorNetworkCircuit(random_circuit(3, 4, 12, seed=5))
    print(f"circuit: {circ.n} qubits, {len(circ.layers)} layers")

    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("normal")
    order, sliced, ctree = find_order(
        tb2, ntn.bond_dims, fq2, sc_target=args.sc_target,
        trials=2, iters=8, parallel=False, seed=0)
    field = make_field(np.complex64, "highest", "split")
    staged = stage_tensors(
        field, [ntn.tensors[i] for i in range(len(ntn.tensors))])

    # slice k more bonds one at a time; at each k contract (a) the full
    # 2^k sum, (b) configuration 0 only, and (c) every single config, and
    # compare the per-config fidelities against the 1/2^k expectation
    # (individual configs fluctuate — random-circuit amplitude weight is
    # Porter-Thomas distributed — while the mean concentrates)
    print(f"{'k':>2} {'config-0':>10} {'mean':>10} {'1/2^k':>10}")
    for k_extra in range(1, args.max_k + 1):
        cands = ctree.slice_candidates()
        if not cands:
            print("no more slice candidates")
            break
        ctree.slicing(sorted(cands, key=str)[0])
        cur_sliced = list(ctree.tn.sliced.keys())
        k = len(cur_sliced)
        steps, out_bonds = contraction_scheme(ctree)
        axes = build_slicing_axes(tb2, cur_sliced)
        run = jax.jit(make_sliced_runner(
            execute_dense, steps, axes, k, (2,) * len(out_bonds), field))
        full = field.unwrap(run(staged)).reshape(-1)
        fids = [state_fidelity(
                    field.unwrap(run(staged,
                                     jnp.arange(c, c + 1,
                                                dtype=jnp.int32))).reshape(-1),
                    full)
                for c in range(2 ** k)]
        print(f"{k:>2} {fids[0]:>10.5f} {np.mean(fids):>10.5f} "
              f"{sliced_fidelity_estimate(k):>10.5f}")


if __name__ == "__main__":
    main()
