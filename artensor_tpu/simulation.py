"""Orchestration: circuit/network -> plan -> compiled scheme -> execution.

Mirrors the reference's user API (/root/reference/artensor/simulation.py):
``TensorNetworkSimulation`` (stateful plan->compile->execute pipeline) and
the one-shot helpers ``tensor_network_contraction`` /
``quantum_circuit_simulation``.  TPU-native differences:

  * The executor is one jitted XLA program covering all einsum steps AND the
    2^k slice enumeration (lax.scan), not a Python loop of kernel launches.
  * Plans, schemes and gather indices are host-side static; payloads are
    staged to device once.
  * ``mesh``/sharding hooks (artensor_tpu.parallel) distribute slice ids
    across chips; the numerics are identical on 1 device.
"""

from dataclasses import dataclass, field

import numpy as np

from .circuits import TensorNetworkCircuit
from .network import NumericalTensorNetwork
from .planner import find_order

# schemes above this many steps execute segmented (a handful of small
# jitted programs) instead of as one monolithic XLA program — the remote
# compile helper OOMs / crawls on huge programs (docs/BENCH_NOTES.md)
SEGMENT_AUTO_THRESHOLD = 256


@dataclass
class PlannerConfig:
    """One place for the planner knobs the reference scatters across callers
    (sc_target 30 vs 31, alpha 32 vs 0, betas overridden everywhere)."""

    sc_target: float = 30.0
    trials: int = 6
    iters: int = 20
    betas: tuple = tuple(np.linspace(3.0, 21.0, 61))
    slicing_repeat: int = 4
    start_seed: int = 0
    alpha: float = 32.0
    parallel: bool = True


# Markers identifying a COMPILE-stage failure (vs a genuine runtime
# error, which must propagate).  Root-caused instances so far: scoped
# VMEM overflow from Mosaic minor-dim window padding (now rejected by
# the planner's VMEM gate, runtime/lanes.py) and HBM demand beyond the
# chip at wide slice-vmap widths — both surface through this
# environment's remote compile helper; plain jax setups raise
# XlaRuntimeError with the XLA:TPU compile text instead.
_COMPILE_FAILURE_MARKERS = (
    "remote_compile",
    "tpu_compile_helper",
    "XLA:TPU compile",
    "Ran out of memory in memory space",
)


def _is_compile_failure(e):
    msg = str(e)
    return any(m in msg for m in _COMPILE_FAILURE_MARKERS)


def check_bitstrings(bitstrings):
    """'sparse' big-batch mode if amplitudes were requested, else 'normal'."""
    if len(bitstrings):
        return "sparse", len(np.unique(bitstrings))
    return "normal", 1


def get_bond_tensors(tensor_bonds):
    """Inverted bond->tensors index (reference-parity helper,
    simulation.py:25-31)."""
    out = {}
    for tid, bonds in tensor_bonds.items():
        for b in bonds:
            out.setdefault(b, set()).add(tid)
    return out


def _qubit_of(bond):
    return int(str(bond).split("-")[1])


def _bond_sort_key(bond):
    """Output-leg ordering key: the encoded qubit for wire-style labels
    '{step}-{qubit}', else the label itself (the reference notebook's
    integer edge labels, SURVEY.md §1, sort naturally; arbitrary labels
    sort as strings).  Generic labels must never crash the output
    permutation (reference-parity entry point robustness)."""
    s = str(bond)
    parts = s.split("-")
    if len(parts) == 2 and parts[0].isdigit() and parts[1].isdigit():
        return (0, int(parts[1]), 0)
    if isinstance(bond, (int, np.integer)):
        return (0, int(bond), 0)
    return (1, 0, s)


class TensorNetworkSimulation:
    """Stateful pipeline: simplify -> plan -> compile -> contract."""

    def __init__(self, tensors, tensor_bonds, bond_dims, final_qubits,
                 bitstrings, pattern, max_bitstrings):
        self.tensors = tensors              # dict id -> numpy array
        self.tensor_bonds = tensor_bonds    # dict id -> bond list (unsliced)
        self.bond_dims = bond_dims
        self.final_qubits = list(final_qubits)
        self.bitstrings = list(bitstrings)
        self.pattern = pattern
        self.max_bitstrings = max_bitstrings

    @classmethod
    def from_circuit(cls, circuit, bitstrings=()):
        """Build from a TensorNetworkCircuit (or qsim path / (n, layers))."""
        if not isinstance(circuit, TensorNetworkCircuit):
            circuit = TensorNetworkCircuit(circuit)
        pattern, max_bitstrings = check_bitstrings(bitstrings)
        tensors, tensor_bonds, bond_dims, final_qubits = circuit.to_numerical_tn()
        ntn = NumericalTensorNetwork(tensors, tensor_bonds, bond_dims, final_qubits)
        tensor_bonds2, final_qubit_ids = ntn.simplify(pattern)
        tensors2 = {i: t for i, t in ntn.tensors.items()}
        return cls(tensors2, tensor_bonds2, ntn.bond_dims, final_qubit_ids,
                   bitstrings, pattern, max_bitstrings)

    # reference-compatible constructor names
    from_circuit_file = from_circuit
    from_tn_circuit = from_circuit

    def prepare_contraction(self, config=None, **overrides):
        """Run the planner and compile the scheme."""
        if config is None:
            config = PlannerConfig(**overrides)
        elif overrides:
            raise TypeError("pass either a PlannerConfig or keyword overrides, not both")
        self.config = config
        order, slicing_bonds, self.ctree = find_order(
            self.tensor_bonds, self.bond_dims, self.final_qubits,
            max_bitstrings=self.max_bitstrings,
            sc_target=config.sc_target, trials=config.trials,
            iters=config.iters, betas=list(config.betas),
            slicing_repeat=config.slicing_repeat,
            start_seed=config.start_seed, alpha=config.alpha,
            parallel=config.parallel,
        )
        self.order = order
        self.slicing_bonds = list(slicing_bonds)
        self._compile_scheme()
        return self

    def update_scheme(self, sc_target=None, bitstrings=None):
        """Recompile the scheme (e.g. for a new bitstring batch) without
        re-planning (reference-parity name, simulation.py:79-88)."""
        if bitstrings is not None:
            self.bitstrings = list(bitstrings)
            pattern, max_bitstrings = check_bitstrings(self.bitstrings)
            assert pattern == self.pattern, "batch/dense mode is fixed at construction"
        if sc_target is not None:
            self.config.sc_target = sc_target
        self._compile_scheme()
        return self

    def _compile_scheme(self, lane_schedule=True):
        from .runtime import executor as ex
        from .runtime import scheme as sch

        if self.pattern == "normal":
            self.steps, self.output_bonds = sch.contraction_scheme(
                self.ctree, lane_schedule=lane_schedule)
            self.bitstrings_sorted = None
        else:
            from .runtime.sparse import contraction_scheme_sparse
            # pod-scale schemes execute SEGMENTED (small per-segment
            # programs), where the monolithic 400+-step compile-crash
            # class does not apply — raise the kernel-scheduling cutoff
            # there.  Chip A/B (n53 sc24, forced end-to-end): kernels
            # 2.5 s/slice vs 25.8 s/slice without — 10x.
            n_order = len(self.ctree.to_order_dfs())
            lane_max = 10_000 if n_order > SEGMENT_AUTO_THRESHOLD else None
            self.steps, self.output_bonds, self.bitstrings_sorted = \
                contraction_scheme_sparse(
                    self.ctree, self.bitstrings,
                    sc_target=self.config.sc_target,
                    lane_schedule=lane_schedule,
                    lane_max_steps=lane_max)
        batched = self.final_qubits if self.pattern == "sparse" else ()
        self.slicing_axes = ex.build_slicing_axes(
            self.tensor_bonds, self.slicing_bonds, batched_tensors=batched)
        # output permutation: sort open legs into qubit order (generic
        # labels sort naturally instead of crashing)
        keys = [_bond_sort_key(b) for b in self.output_bonds]
        perm = (tuple(sorted(range(len(keys)), key=keys.__getitem__))
                if keys else ())
        if self.pattern == "sparse":
            perm = (0,) + tuple(p + 1 for p in perm)
        self.permute_dims = perm

    def contraction(self, dtype=np.complex64, mesh=None, precision="highest",
                    mode="split", algo="naive", scientific_notation=False,
                    checkpoint_path=None, report=None, slice_batch=1,
                    profile_dir=None):
        """Execute the compiled plan; returns amplitudes as a numpy array.

        'normal': tensor of shape (2,)*n_open in qubit order.
        'sparse': (len(bitstrings_sorted),) amplitude batch.

        ``mode``: 'split' (TPU-native (re, im) pairs, default) or 'complex'.
        ``mesh``: optional jax mesh to shard the slice loop over.
        ``scientific_notation``: renormalize every intermediate, returning
          (amplitudes, log10_factor) — true values = amps * 10**factor.
        ``checkpoint_path``: persist partial slice sums for resume.
        ``report``: a runtime.metrics.ContractionReport to fill in.
        ``profile_dir``: capture a jax profiler trace of the execution.
        """
        import jax

        from .cache import enable_compile_cache
        from .ops.field import make_field
        from .runtime import executor as ex
        from .runtime import metrics as mt
        from .runtime.segmented import apply_dense_step
        from .runtime.sparse import apply_sparse_step, execute_sparse

        enable_compile_cache()

        field = make_field(dtype, precision, mode, algo)
        # fold slice-independent, batch-free steps on the host: after
        # gate-block fusion most steps are tiny static gate merges whose
        # per-step overhead would otherwise ride the compiled scan body
        run_steps, host_arrays = ex.precompute_static_steps(
            self.steps, [self.tensors[i] for i in range(len(self.tensors))],
            self.slicing_axes)
        arrays = ex.stage_tensors(field, host_arrays)
        k = len(self.slicing_bonds)
        if self.pattern == "normal":
            out_shape = (2,) * len(self.output_bonds)
            execute = ex.execute_dense
            apply_step = apply_dense_step
        else:
            out_shape = (len(self.bitstrings_sorted),) + \
                (2,) * len(self.output_bonds)
            execute = execute_sparse
            apply_step = apply_sparse_step

        factor = None
        profiler = None
        if profile_dir is not None:
            profiler = jax.profiler.trace(profile_dir)
            profiler.__enter__()
        with mt.Timer() as wall:
            if scientific_notation:
                from .runtime.rescaled import make_rescaled_runner
                run = jax.jit(make_rescaled_runner(
                    apply_step, run_steps, self.slicing_axes, k, out_shape,
                    field))
                result, factor = run(arrays)
            elif mesh is not None and len(run_steps) > SEGMENT_AUTO_THRESHOLD:
                # pod-scale scheme + mesh: the monolithic shard_map program
                # does not compile at 400+ steps (round-2 verdict item) —
                # partition slice ranges across the mesh's devices and run
                # the compiled segment programs on each
                from .runtime.segmented import run_segmented_sharded
                result = run_segmented_sharded(
                    arrays, run_steps, self.slicing_axes, k, out_shape,
                    field, apply_step, list(mesh.devices.flat),
                    slice_batch=slice_batch if slice_batch > 1 else 1)
            elif mesh is not None:
                from .parallel import run_sliced_contraction
                result = run_sliced_contraction(
                    arrays, run_steps, self.slicing_axes, k, out_shape, mesh,
                    field=field, execute=execute)
            elif checkpoint_path is not None:
                from .runtime.checkpoint import run_sliced_checkpointed
                run = jax.jit(ex.make_sliced_runner(
                    execute, run_steps, self.slicing_axes, k, out_shape,
                    field))
                result = run_sliced_checkpointed(
                    run, arrays, k, out_shape, field, checkpoint_path)
            elif len(run_steps) > SEGMENT_AUTO_THRESHOLD:
                # huge schemes: one monolithic XLA program compiles for
                # tens of minutes (and can OOM the remote compile helper);
                # segmented mode compiles a handful of small programs and
                # walks them from the host (runtime/segmented.py)
                from .runtime.segmented import run_segmented
                result = run_segmented(
                    arrays, run_steps, self.slicing_axes, k, out_shape,
                    field, apply_step,
                    slice_batch=slice_batch if slice_batch > 1 else 1)
            else:
                run = jax.jit(ex.make_sliced_runner(
                    execute, run_steps, self.slicing_axes, k, out_shape,
                    field, slice_batch=slice_batch))
                result = None
                while result is None:
                    try:
                        if report is not None:
                            # AOT split: the report separates compile/run
                            with mt.Timer() as ct:
                                compiled = run.lower(arrays).compile()
                            report.compile_s = ct.elapsed
                            result = compiled(arrays)
                        else:
                            result = run(arrays)
                    except Exception as e:  # pragma: no cover (env-specific)
                        import logging
                        if not _is_compile_failure(e):
                            raise
                        msg = str(e)
                        if ("Ran out of memory" in msg
                                or "hbm" in msg) and slice_batch > 1:
                            # the compile helper reports HBM demand
                            # explicitly now: the slice-vmap width is the
                            # knob — halve and retry (a VMEM overflow also
                            # shrinks with the width when the window spans
                            # the vmap batch fold)
                            slice_batch //= 2
                            logging.getLogger(__name__).warning(
                                "compile OOM; retrying with slice_batch="
                                "%d", slice_batch)
                            run = jax.jit(ex.make_sliced_runner(
                                execute, run_steps, self.slicing_axes, k,
                                out_shape, field, slice_batch=slice_batch))
                            continue
                        # remaining helper failures (round-2 noted crashes
                        # with no diagnostics): conservative orders,
                        # segmented programs
                        logging.getLogger(__name__).warning(
                            "monolithic compile failed (%s); retrying with "
                            "conservative orders in segmented mode", e)
                        from .runtime.segmented import run_segmented
                        self._compile_scheme(lane_schedule=False)
                        run_steps, host_arrays = ex.precompute_static_steps(
                            self.steps,
                            [self.tensors[i]
                             for i in range(len(self.tensors))],
                            self.slicing_axes)
                        arrays = ex.stage_tensors(field, host_arrays)
                        result = run_segmented(
                            arrays, run_steps, self.slicing_axes, k,
                            out_shape, field, apply_step)
            result = field.unwrap(result).reshape(out_shape)
        if profiler is not None:
            profiler.__exit__(None, None, None)
        if report is not None:
            report.predicted_flops = (2 ** k) * mt.scheme_flops(
                run_steps, field.algo if mode == "split" else "naive")
            report.wall_s = wall.elapsed
            report.num_slices = 2 ** k
            report.num_steps = len(run_steps)
            report.reorders = mt.reorder_census(run_steps)
            tc, sc, _ = self.ctree.complexity()
            report.tc, report.sc = tc, sc
        if self.permute_dims:
            result = result.transpose(self.permute_dims)
        if scientific_notation:
            return result, float(np.asarray(factor))
        return result


def _dense_shard_setup(sim, d_out):
    """Obtain (steps, axes, chosen, output_bonds, k_sum, restore) for an
    output-sharded dense contraction.

    Uses the pre-sliced plan from :meth:`prepare_output_sharded` when one
    matches; otherwise slices ``d_out`` open legs of the existing planned
    tree post hoc and recompiles (fine at small scale — but note the
    planner could not push sc below the full output size that way, so
    large outputs should plan with ``prepare_output_sharded``).
    """
    from .runtime import executor as ex
    from .runtime import scheme as sch

    assert sim.pattern == "normal", "output sharding is a dense-mode feature"
    plan = getattr(sim, "_shard_plan", None)
    if plan is not None and plan["d_out"] == d_out:
        return (plan["steps"], plan["axes"], plan["chosen"],
                plan["output_bonds"], plan["k_sum"], lambda: None)
    tn = sim.ctree.tn
    open_bonds = [b for b, ts in tn.bond_tensors.items() if len(ts) == 1]
    open_bonds.sort(key=_bond_sort_key)
    assert len(open_bonds) >= d_out, "fewer open legs than requested shards"
    chosen = open_bonds[:d_out]
    for b in chosen:
        sim.ctree.slicing(b)
    steps, output_bonds = sch.contraction_scheme(sim.ctree)
    axes = ex.build_slicing_axes(
        sim.tensor_bonds, chosen + sim.slicing_bonds)

    def restore():
        for b in reversed(chosen):
            sim.ctree.add_bond(b)

    return steps, axes, chosen, output_bonds, len(sim.slicing_bonds), restore


def _dense_shard_perm(chosen, output_bonds):
    """Permutation taking (chosen qubits + local legs) to qubit order."""
    keys = [_bond_sort_key(b) for b in chosen] + \
        [_bond_sort_key(b) for b in output_bonds]
    return tuple(sorted(range(len(keys)), key=keys.__getitem__))


def _sharded_methods():
    """Attach output-sharding methods to TensorNetworkSimulation."""

    def prepare_output_sharded(self, d_out, config=None, **overrides):
        """Plan the dense contraction with ``d_out`` output legs PRE-sliced.

        In dense mode the planner cannot push sc below the full output size
        (the root tensor IS the output and open legs must not be sliced-
        and-summed); removing ``d_out`` output legs first lets the memory
        budget apply to each 2^(n-d_out) block.  This is the scale path for
        outputs exceeding one chip's HBM (Sycamore n30's 2^30 state,
        /root/reference/examples/sycamore.ipynb cell 5)."""
        from .runtime import executor as ex
        from .runtime import scheme as sch

        assert self.pattern == "normal"
        if config is None:
            config = PlannerConfig(**overrides)
        self.config = config
        bt = get_bond_tensors(self.tensor_bonds)
        open_bonds = sorted((b for b, ts in bt.items() if len(ts) == 1),
                            key=_bond_sort_key)
        assert len(open_bonds) >= d_out
        chosen = open_bonds[:d_out]
        chosen_set = set(chosen)
        tb = {t: [b for b in bs if b not in chosen_set]
              for t, bs in self.tensor_bonds.items()}
        bd = {b: d for b, d in self.bond_dims.items() if b not in chosen_set}
        order, sliced, ctree = find_order(
            tb, bd, self.final_qubits, max_bitstrings=self.max_bitstrings,
            sc_target=config.sc_target, trials=config.trials,
            iters=config.iters, betas=list(config.betas),
            slicing_repeat=config.slicing_repeat,
            start_seed=config.start_seed, alpha=config.alpha,
            parallel=config.parallel)
        steps, output_bonds = sch.contraction_scheme(ctree)
        axes = ex.build_slicing_axes(self.tensor_bonds, chosen + sliced)
        self.ctree = ctree
        self.order = order
        self.slicing_bonds = list(sliced)
        self._shard_plan = {"d_out": d_out, "chosen": chosen, "steps": steps,
                            "output_bonds": output_bonds, "axes": axes,
                            "k_sum": len(sliced)}
        return self

    def contraction_output_sharded(self, mesh, d_out=None,
                                   dtype=np.complex64, precision="highest",
                                   mode="split"):
        """Dense full amplitudes with the output sharded over ``mesh``.

        Each device computes 2^(n - d_out) amplitudes (its block of the
        output tensor); blocks concatenate over the mesh — this is how an
        output too large for one chip's HBM (e.g. Sycamore n30's 8 GB
        state) spreads across a pod.  Returns the FULL 2^n tensor in qubit
        order (gathered to host).
        """
        import jax

        from .ops.field import make_field
        from .parallel import run_output_sharded
        from .runtime import executor as ex

        n_dev = int(np.prod(mesh.devices.shape))
        if d_out is None:
            d_out = max(1, int(np.ceil(np.log2(n_dev))))
        field = make_field(dtype, precision, mode)
        steps, axes, chosen, output_bonds, k_sum, restore = _dense_shard_setup(
            self, d_out)
        try:
            steps, host_arrays = ex.precompute_static_steps(
                steps, [self.tensors[i] for i in range(len(self.tensors))],
                axes)
            staged = ex.stage_tensors(field, host_arrays)
            local_shape = (2,) * len(output_bonds)
            res = run_output_sharded(
                staged, steps, axes, d_out, k_sum,
                local_shape, mesh, field=field)
            out = field.unwrap(res).reshape((2,) * d_out + local_shape)
            return out.transpose(_dense_shard_perm(chosen, output_bonds))
        finally:
            restore()

    def contraction_output_blocks(self, d_out, dtype=np.complex64,
                                  precision="highest", mode="split",
                                  postprocess=None):
        """Generator over the 2^d_out disjoint output blocks on ONE device.

        Yields ``(fixed_bits, qubits, block)``: the chosen output qubits,
        their fixed bit assignment (MSB first), and the block of amplitudes
        for the remaining qubits in qubit order.  Lets a single chip walk
        an output too large for its HBM (and the host validate/stream
        blocks without ever holding the full state).

        ``postprocess(field, oid, value)``: optional ON-DEVICE reduction of
        each block before it is pulled to the host (e.g. select the
        amplitudes being validated, or accumulate a norm) — yields its
        unwrapped result as ``block`` instead of the full 2^(n-d) tensor.
        ``value`` is the field-typed FLAT physical block.
        """
        import jax

        from .ops.field import make_field
        from .runtime import executor as ex

        field = make_field(dtype, precision, mode)
        steps, axes, chosen, output_bonds, k, restore = _dense_shard_setup(
            self, d_out)
        try:
            steps, host_arrays = ex.precompute_static_steps(
                steps, [self.tensors[i] for i in range(len(self.tensors))],
                axes)
            staged = ex.stage_tensors(field, host_arrays)
            local_shape = (2,) * len(output_bonds)
            run = jax.jit(ex.make_sliced_runner(
                ex.execute_dense, steps, axes, d_out + k, local_shape, field))
            import jax.numpy as jnp

            qubits = [_bond_sort_key(b)[1] for b in chosen]
            lkeys = [_bond_sort_key(b) for b in output_bonds]
            local_perm = tuple(sorted(range(len(lkeys)), key=lkeys.__getitem__))
            for oid in range(2 ** d_out):
                ids = jnp.arange(oid * 2 ** k, (oid + 1) * 2 ** k,
                                 dtype=jnp.int32)
                raw = run(staged, ids)
                bits = np.binary_repr(oid, d_out)
                if postprocess is not None:
                    yield bits, qubits, field.unwrap(postprocess(
                        field, oid, raw))
                    continue
                block = field.unwrap(raw).reshape(local_shape)
                yield bits, qubits, block.transpose(local_perm)
        finally:
            restore()

    TensorNetworkSimulation.prepare_output_sharded = prepare_output_sharded
    TensorNetworkSimulation.contraction_output_sharded = contraction_output_sharded
    TensorNetworkSimulation.contraction_output_blocks = contraction_output_blocks


_sharded_methods()


def tensor_network_contraction(tensors, tensor_bonds, bond_dims, final_qubits,
                               bitstrings=(), sc_target=31, trial_num=8,
                               alpha=0.0, dtype=np.complex64, **kwargs):
    """One-shot: simplify, plan, compile, contract a numerical network.

    Returns (amplitudes, bitstrings): bitstrings is the sorted order the
    sparse amplitudes come back in ([] for dense mode).
    """
    pattern, max_bitstrings = check_bitstrings(bitstrings)
    ntn = NumericalTensorNetwork(tensors, tensor_bonds, bond_dims, final_qubits)
    tensor_bonds2, final_qubit_ids = ntn.simplify(pattern)
    sim = TensorNetworkSimulation(
        dict(ntn.tensors), tensor_bonds2, ntn.bond_dims, final_qubit_ids,
        bitstrings, pattern, max_bitstrings)
    cfg_kwargs = {"sc_target": sc_target, "trials": trial_num, "iters": 50,
                  "alpha": alpha}
    cfg_kwargs.update({k: v for k, v in kwargs.items()
                       if k in PlannerConfig.__dataclass_fields__})
    cfg = PlannerConfig(**cfg_kwargs)
    sim.prepare_contraction(cfg)
    result = sim.contraction(
        dtype=dtype, mesh=kwargs.get("mesh"),
        precision=kwargs.get("precision", "highest"),
        mode=kwargs.get("mode", "split"))
    out_bits = sim.bitstrings_sorted if pattern == "sparse" else []
    return result, out_bits


def quantum_circuit_simulation(circuit_filename, bitstrings=(), sc_target=31,
                               trial_num=8, alpha=0.0, dtype=np.complex64,
                               **kwargs):
    """One-shot from a qsim circuit file (reference-parity entry point).

    Also accepts an already-built TensorNetworkCircuit or an (n, layers)
    pair."""
    circ = (circuit_filename
            if isinstance(circuit_filename, TensorNetworkCircuit)
            else TensorNetworkCircuit(circuit_filename))
    tensors, tensor_bonds, bond_dims, final_qubits = circ.to_numerical_tn()
    return tensor_network_contraction(
        tensors, tensor_bonds, bond_dims, final_qubits, bitstrings,
        sc_target, trial_num, alpha, dtype, **kwargs)
