"""artensor_tpu — TPU-native tensor-network contraction for quantum circuits.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
Fanerst/artensor: a host-side combinatorial planner (greedy + simulated
annealing with dynamic bond slicing) emits static contraction plans that JIT
into sequences of MXU contraction steps; circuits (Google qsim format,
Sycamore gate set) run in full-amplitude or sparse-state big-batch mode, and
sliced sub-tasks shard across a TPU mesh via ``shard_map``/``psum``.

Layering:
  planner/   pure-Python/numpy order optimization (never imports jax)
  circuits/  circuit front ends and gate library (numpy)
  network    tensor-network topology + host payloads
  ops/       TPU contraction primitives (XLA einsum + Pallas kernels)
  runtime/   plan -> static scheme -> jitted executors
  parallel/  device mesh, slice/batch sharding
  simulation orchestration API (plan -> compile -> execute)
"""

from .network import AbstractTensorNetwork, NumericalTensorNetwork
from .planner import (
    ContractionTree,
    GreedyOrderFinder,
    find_order,
    simulate_annealing,
)
from .utils import (einsum_eq_convert, log2sumexp2, log10sumexp2,
                    tensordot2einsum)

__version__ = "0.2.0"

__all__ = [
    "AbstractTensorNetwork",
    "NumericalTensorNetwork",
    "ContractionTree",
    "GreedyOrderFinder",
    "find_order",
    "simulate_annealing",
    "einsum_eq_convert",
    "tensordot2einsum",
    "log2sumexp2",
    "log10sumexp2",
]


def __getattr__(name):
    """Lazy exports that pull in jax only when actually used."""
    if name in ("TensorNetworkCircuit", "parse_qsim", "load_cirq_circuit",
                "from_cirq"):
        from . import circuits
        return getattr(circuits, name)
    if name in (
        "contraction_scheme", "contraction_scheme_sparse",
        "tensor_contraction", "tensor_contraction_sparse",
    ):
        from . import runtime
        return getattr(runtime, name)
    if name in ("save_plan", "load_plan"):
        from . import plan_io
        return getattr(plan_io, name)
    if name == "make_field":
        from .ops.field import make_field
        return make_field
    if name in (
        "TensorNetworkSimulation", "tensor_network_contraction",
        "quantum_circuit_simulation",
    ):
        from . import simulation as _sim
        return getattr(_sim, name)
    if name in ("MPS", "mps_simulate"):
        from .utils import mps as _mps
        return getattr(_mps, name)
    if name in ("linear_xeb", "state_fidelity",
                "xeb_against_ground_truth", "sliced_fidelity_estimate"):
        from .utils import xeb as _xeb
        return getattr(_xeb, name)
    raise AttributeError(f"module 'artensor_tpu' has no attribute {name!r}")
