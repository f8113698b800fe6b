"""Command-line interface: ``python -m artensor_tpu <command>``.

The reference has no CLI at all (its notebook is the de-facto UI,
SURVEY.md §1 L6).  Commands:

  simulate  amplitudes of a circuit (qsim file or generated-cirq .py)
  plan      run the SA planner and save the plan as JSON
  info      inspect a circuit or saved plan
  bench     time a planned contraction (repeat runs, sustained TFLOP/s)
  verify    cross-check sparse amplitudes against the truncated-MPS oracle
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


def cmd_bench(args):
    import time

    from .ops.field import make_field
    from .runtime import executor as ex
    from .runtime import metrics as mt
    from .simulation import PlannerConfig, TensorNetworkSimulation

    circ = _load_circuit(args.circuit)
    bitstrings = _read_bitstrings(args.bitstrings)
    sim = TensorNetworkSimulation.from_circuit(circ, bitstrings)
    from . import plan_io
    order, sliced, ctree = plan_io.load_plan(args.plan)
    sim.config = PlannerConfig(sc_target=args.sc_target)
    sim.order, sim.slicing_bonds, sim.ctree = order, sliced, ctree
    sim._compile_scheme()

    import jax
    field = make_field(np.complex64, args.precision, "split")
    staged = ex.stage_tensors(
        field, [sim.tensors[i] for i in range(len(sim.tensors))])
    k = len(sim.slicing_bonds)
    if sim.pattern == "sparse":
        from .runtime.sparse import execute_sparse as execute
        out_shape = (len(sim.bitstrings_sorted),)
    else:
        execute = ex.execute_dense
        out_shape = (2,) * len(sim.output_bonds)
    from .simulation import SEGMENT_AUTO_THRESHOLD
    if len(sim.steps) > SEGMENT_AUTO_THRESHOLD:
        # pod-scale schemes: a monolithic program reproduces the compile
        # crash/OOM documented in docs/BENCH_NOTES.md — time the segmented
        # path instead (the path simulate/contraction would actually take)
        from .runtime.segmented import run_segmented
        if sim.pattern == "sparse":
            from .runtime.sparse import apply_sparse_step as apply_step
        else:
            from .runtime.segmented import apply_dense_step as apply_step

        def once():
            t0 = time.time()
            r = run_segmented(staged, sim.steps, sim.slicing_axes, k,
                              out_shape, field, apply_step)
            jax.block_until_ready(r)
            _ = np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
            return time.time() - t0
    else:
        run = jax.jit(ex.make_sliced_runner(
            execute, sim.steps, sim.slicing_axes, k, out_shape, field,
            slice_batch=args.slice_batch))

        def once():
            t0 = time.time()
            r = run(staged)
            jax.block_until_ready(r)
            _ = np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
            return time.time() - t0

    compile_s = once()
    walls = sorted(once() for _ in range(args.repeats))
    wall = walls[len(walls) // 2]
    flops = (2 ** k) * mt.scheme_flops(sim.steps)
    roofline = (2 ** k) * mt.scheme_roofline_seconds(sim.steps)
    print(json.dumps({
        "wall_s": round(wall, 3), "compile_s": round(compile_s, 1),
        "slices": 2 ** k, "steps": len(sim.steps),
        "sustained_tflops": round(flops / wall / 1e12, 2),
        "roofline_s": round(roofline, 3),
        "roofline_achieved": round(roofline / wall, 3),
    }))


def cmd_verify(args):
    from .simulation import quantum_circuit_simulation
    from .utils.mps import mps_simulate

    circ = _load_circuit(args.circuit)
    bitstrings = _read_bitstrings(args.bitstrings)
    if not bitstrings:
        rng = np.random.default_rng(0)
        picks = rng.choice(2 ** circ.n, min(16, 2 ** circ.n), replace=False)
        bitstrings = [np.binary_repr(b, circ.n) for b in picks]
    amps, bs = quantum_circuit_simulation(
        circ, bitstrings, args.sc_target, trial_num=args.trials,
        iters=args.iters, parallel=not args.serial)
    amap = dict(zip(bs, np.asarray(amps)))
    mps = mps_simulate(circ, chi=args.chi)
    worst = 0.0
    for b in bitstrings:
        ref = mps.amplitude(b)
        err = abs(amap[b] - ref)
        worst = max(worst, err)
        print(f"{b} tn={amap[b]:.8f} mps={ref:.8f} |diff|={err:.2e}")
    # tolerance scales with the typical amplitude magnitude 2^(-n/2): a
    # fixed absolute tol would silently pass order-unity RELATIVE errors
    # on larger circuits (amplitudes shrink as the state spreads)
    threshold = args.tol * 2.0 ** (-circ.n / 2)
    print(json.dumps({"max_abs_diff": float(worst),
                      "threshold": threshold,
                      "mps_fidelity_estimate": mps.fidelity_estimate,
                      "mps_max_bond": mps.max_bond()}), file=sys.stderr)
    if mps.fidelity_estimate <= 0.999:
        # truncated oracle: the comparison proves nothing — fail loudly
        # instead of silently passing (exit 2 distinguishes "could not
        # verify" from "verified mismatch")
        print("# ERROR: MPS fidelity estimate "
              f"{mps.fidelity_estimate:.6f} <= 0.999 — oracle too "
              "truncated to verify; raise --chi", file=sys.stderr)
        sys.exit(2)
    if worst > threshold:
        sys.exit(1)


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

    pb = sub.add_parser("bench", help="time a planned contraction")
    pb.add_argument("circuit")
    pb.add_argument("--plan", required=True)
    pb.add_argument("--bitstrings")
    pb.add_argument("--sc-target", type=float, default=30.0)
    pb.add_argument("--precision", default="highest")
    pb.add_argument("--slice-batch", type=int, default=1)
    pb.add_argument("--repeats", type=int, default=3)
    pb.set_defaults(fn=cmd_bench)

    pv = sub.add_parser("verify",
                        help="cross-check amplitudes against the MPS oracle")
    pv.add_argument("circuit")
    pv.add_argument("--bitstrings")
    pv.add_argument("--sc-target", type=float, default=30.0)
    pv.add_argument("--chi", type=int, default=256)
    pv.add_argument("--trials", type=int, default=4)
    pv.add_argument("--iters", type=int, default=12)
    pv.add_argument("--tol", type=float, default=1e-2,
                    help="max |diff| RELATIVE to the typical amplitude "
                    "magnitude 2^(-n/2)")
    pv.add_argument("--serial", action="store_true")
    pv.set_defaults(fn=cmd_verify)

    args = p.parse_args(argv)
    from .cache import enable_compile_cache
    enable_compile_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
