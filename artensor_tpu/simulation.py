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

    def _compile_scheme(self):
        from .runtime import executor as ex
        from .runtime import scheme as sch

        if self.pattern == "normal":
            self.steps, self.output_bonds = sch.contraction_scheme(self.ctree)
            self.bitstrings_sorted = None
        else:
            from .runtime.sparse import contraction_scheme_sparse
            self.steps, self.output_bonds, self.bitstrings_sorted = \
                contraction_scheme_sparse(
                    self.ctree, self.bitstrings,
                    sc_target=self.config.sc_target)
        batched = self.final_qubits if self.pattern == "sparse" else ()
        self.slicing_axes = ex.build_slicing_axes(
            self.tensor_bonds, self.slicing_bonds, batched_tensors=batched)
        # output permutation: sort open legs into qubit order
        qubit_order = [_qubit_of(b) for b in self.output_bonds]
        perm = tuple(np.argsort(qubit_order)) if qubit_order else ()
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

        from .ops.field import make_field
        from .runtime import executor as ex
        from .runtime import metrics as mt
        from .runtime.segmented import apply_dense_step
        from .runtime.sparse import apply_sparse_step, execute_sparse

        field = make_field(dtype, precision, mode, algo)
        arrays = ex.stage_tensors(
            field, [self.tensors[i] for i in range(len(self.tensors))])
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
                    apply_step, self.steps, self.slicing_axes, k, out_shape,
                    field))
                result, factor = run(arrays)
            elif mesh is not None:
                from .parallel import run_sliced_contraction
                result = run_sliced_contraction(
                    arrays, self.steps, self.slicing_axes, k, out_shape, mesh,
                    field=field, execute=execute)
            elif checkpoint_path is not None:
                from .runtime.checkpoint import run_sliced_checkpointed
                run = jax.jit(ex.make_sliced_runner(
                    execute, self.steps, self.slicing_axes, k, out_shape,
                    field))
                result = run_sliced_checkpointed(
                    run, arrays, k, out_shape, field, checkpoint_path)
            else:
                run = jax.jit(ex.make_sliced_runner(
                    execute, self.steps, self.slicing_axes, k, out_shape,
                    field, slice_batch=slice_batch))
                result = run(arrays)
            result = field.unwrap(result).reshape(out_shape)
        if profiler is not None:
            profiler.__exit__(None, None, None)
        if report is not None:
            report.predicted_flops = (2 ** k) * mt.scheme_flops(
                self.steps, field.algo if mode == "split" else "naive")
            report.wall_s = wall.elapsed
            report.num_slices = 2 ** k
            report.num_steps = len(self.steps)
            report.reorders = mt.reorder_census(self.steps)
            tc, sc, _ = self.ctree.complexity()
            report.tc, report.sc = tc, sc
        if self.permute_dims:
            result = result.transpose(self.permute_dims)
        if scientific_notation:
            return result, float(np.asarray(factor))
        return result


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
    """One-shot from a qsim circuit file (reference-parity entry point)."""
    circ = TensorNetworkCircuit(circuit_filename)
    tensors, tensor_bonds, bond_dims, final_qubits = circ.to_numerical_tn()
    return tensor_network_contraction(
        tensors, tensor_bonds, bond_dims, final_qubits, bitstrings,
        sc_target, trial_num, alpha, dtype, **kwargs)
