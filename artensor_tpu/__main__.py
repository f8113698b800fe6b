"""Command-line interface: ``python -m artensor_tpu <command>``.

The reference has no CLI at all (its notebook is the de-facto UI,
SURVEY.md §1 L6).  Commands:

  simulate  amplitudes of a circuit (qsim file or generated-cirq .py)
  plan      run the SA planner and save the plan as JSON
  info      inspect a circuit or saved plan
"""

import argparse
import json
import sys

import numpy as np


def _load_circuit(path):
    from .circuits import TensorNetworkCircuit, load_cirq_circuit

    if str(path).endswith(".py"):
        return TensorNetworkCircuit(load_cirq_circuit(path))
    return TensorNetworkCircuit(path)


def _read_bitstrings(arg):
    if arg is None:
        return []
    if arg.startswith("@"):
        with open(arg[1:]) as f:
            return [ln.split()[0] for ln in f if ln.strip()]
    return arg.split(",")


def cmd_simulate(args):
    from .runtime.metrics import ContractionReport
    from .simulation import PlannerConfig, TensorNetworkSimulation

    circ = _load_circuit(args.circuit)
    bitstrings = _read_bitstrings(args.bitstrings)
    sim = TensorNetworkSimulation.from_circuit(circ, bitstrings)
    cfg = PlannerConfig(sc_target=args.sc_target, trials=args.trials,
                        iters=args.iters, parallel=not args.serial)
    if args.plan:
        from . import plan_io
        order, sliced, ctree = plan_io.load_plan(args.plan)
        sim.config = cfg
        sim.order, sim.slicing_bonds, sim.ctree = order, sliced, ctree
        sim._compile_scheme()
    else:
        sim.prepare_contraction(cfg)
    report = ContractionReport()
    result = sim.contraction(
        dtype=np.complex64 if args.dtype == "complex64" else np.complex128,
        precision=args.precision, report=report,
        scientific_notation=args.scientific_notation,
        checkpoint_path=args.checkpoint)
    if args.scientific_notation:
        result, factor = result
        print(f"# log10 factor: {factor}", file=sys.stderr)
    print(f"# {report.summary()}", file=sys.stderr)
    if sim.pattern == "sparse":
        for bs, amp in zip(sim.bitstrings_sorted, np.asarray(result)):
            print(f"{bs} {amp.real:.10e} {amp.imag:.10e}")
    else:
        amps = np.asarray(result).reshape(-1)
        if args.out:
            np.save(args.out, amps)
            print(f"# full state ({amps.shape[0]} amplitudes) -> {args.out}",
                  file=sys.stderr)
        else:
            for idx in range(min(len(amps), args.head)):
                bs = np.binary_repr(idx, circ.n)
                print(f"{bs} {amps[idx].real:.10e} {amps[idx].imag:.10e}")


def cmd_plan(args):
    from . import plan_io
    from .network import NumericalTensorNetwork
    from .planner import find_order
    from .simulation import check_bitstrings

    circ = _load_circuit(args.circuit)
    bitstrings = _read_bitstrings(args.bitstrings)
    pattern, max_bitstrings = check_bitstrings(bitstrings)
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify(pattern)
    order, sliced, ctree = find_order(
        tb2, ntn.bond_dims, fq2, max_bitstrings=max_bitstrings,
        sc_target=args.sc_target, trials=args.trials, iters=args.iters,
        betas=np.linspace(3.0, 21.0, 61), slicing_repeat=4,
        parallel=not args.serial)
    plan_io.save_plan(args.out, ctree,
                      meta={"circuit": str(args.circuit), "pattern": pattern,
                            "sc_target": args.sc_target})
    tc, sc, mc = ctree.complexity()
    print(json.dumps({"plan": args.out, "tc": tc, "sc": sc, "mc": mc,
                      "sliced_bonds": len(sliced),
                      "slices": 2 ** len(sliced)}))


def cmd_info(args):
    if str(args.target).endswith(".json"):
        from . import plan_io
        order, sliced, ctree = plan_io.load_plan(args.target)
        tc, sc, mc = ctree.complexity()
        print(json.dumps({
            "type": "plan", "steps": len(order), "sliced_bonds": len(sliced),
            "slices": 2 ** len(sliced), "tc": tc, "sc": sc, "mc": mc,
            "est_flops_per_slice": 8 * 10 ** tc,
            "max_intermediate_bytes": 8 * 2 ** sc,
        }))
    else:
        circ = _load_circuit(args.target)
        tb, bd, fq = circ.to_abstract_tn()
        gates = sum(len(layer) for layer in circ.layers)
        print(json.dumps({
            "type": "circuit", "qubits": circ.n, "layers": len(circ.layers),
            "gates": gates, "tensors": len(tb), "bonds": len(bd),
        }))


def main(argv=None):
    p = argparse.ArgumentParser(prog="artensor_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    ps = sub.add_parser("simulate", help="compute amplitudes of a circuit")
    ps.add_argument("circuit")
    ps.add_argument("--bitstrings", help="comma list or @file (sparse mode); "
                    "omit for full amplitudes")
    ps.add_argument("--plan", help="reuse a saved plan JSON")
    ps.add_argument("--sc-target", type=float, default=30.0)
    ps.add_argument("--trials", type=int, default=6)
    ps.add_argument("--iters", type=int, default=20)
    ps.add_argument("--dtype", default="complex64",
                    choices=["complex64", "complex128"])
    ps.add_argument("--precision", default="highest",
                    choices=["default", "high", "highest"])
    ps.add_argument("--scientific-notation", action="store_true")
    ps.add_argument("--checkpoint", help="checkpoint file for resume")
    ps.add_argument("--serial", action="store_true",
                    help="disable planner process parallelism")
    ps.add_argument("--out", help="save full state vector to .npy")
    ps.add_argument("--head", type=int, default=16,
                    help="dense mode: print first N amplitudes")
    ps.set_defaults(fn=cmd_simulate)

    pp = sub.add_parser("plan", help="plan a contraction and save it")
    pp.add_argument("circuit")
    pp.add_argument("--out", required=True)
    pp.add_argument("--bitstrings")
    pp.add_argument("--sc-target", type=float, default=30.0)
    pp.add_argument("--trials", type=int, default=8)
    pp.add_argument("--iters", type=int, default=20)
    pp.add_argument("--serial", action="store_true")
    pp.set_defaults(fn=cmd_plan)

    pi = sub.add_parser("info", help="inspect a circuit or plan")
    pi.add_argument("target")
    pi.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
