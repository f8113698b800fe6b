"""Circuit front ends (the framework's "model zoo"): qsim parser, Sycamore
gate library, generated-cirq-file loader, and exact simulation oracles."""

from . import gates
from .circuit import TensorNetworkCircuit, parse_qsim
from .cirq_compat import from_cirq, load_cirq_circuit

__all__ = ["gates", "TensorNetworkCircuit", "parse_qsim",
           "load_cirq_circuit", "from_cirq"]
