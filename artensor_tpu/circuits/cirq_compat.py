"""Load Google's generated cirq circuit files without cirq.

The Sycamore circuit files shipped with the reference
(examples/circuit_n{n}_m{m}_s{s}_e{e}_p{seq}.py) are generated Python that
only ever uses: GridQubit, Moment, Circuit, X**0.5, Y**0.5,
PhasedXPowGate(phase_exponent=0.25, exponent=0.5), Rz(rads), FSimGate(theta,
phi).  This module executes such a file against a minimal shim namespace and
converts the result to the ``(n, layers)`` form of
:class:`artensor_tpu.circuits.circuit.TensorNetworkCircuit`.

Gate-matrix equivalences (verified against cirq unitaries):
  X**0.5                      -> 'x_1_2'
  Y**0.5                      -> 'y_1_2'
  PhasedXPowGate(0.25, 0.5)   -> 'hz_1_2'   (the W^1/2 gate)
  Rz(r)                       -> 'rz' with phi = r
  FSimGate(theta, phi)        -> 'fsim'

SECURITY NOTE: this executes the circuit file as Python.  Only load trusted,
generated circuit files.
"""

import math
import types

import numpy as np


class _Qubit:
    def __init__(self, row, col):
        self.key = (row, col)

    def __hash__(self):
        return hash(self.key)

    def __eq__(self, other):
        return self.key == other.key

    def __lt__(self, other):
        return self.key < other.key

    def __repr__(self):
        return f"GridQubit{self.key}"


class _Op:
    def __init__(self, name, params, qubits):
        self.name = name
        self.params = params
        self.qubits = qubits


class _Gate:
    def __init__(self, name, params=()):
        self.name = name
        self.params = tuple(params)

    def on(self, *qubits):
        return _Op(self.name, self.params, qubits)

    def __call__(self, *qubits):
        return self.on(*qubits)


class _PowBase:
    """cirq.X / cirq.Y support only the **0.5 form these files use."""

    def __init__(self, name):
        self.name = name

    def __pow__(self, exponent):
        if exponent != 0.5:
            raise NotImplementedError(
                f"{self.name}**{exponent} not used by Sycamore circuit files")
        return _Gate(f"{self.name.lower()}_1_2")


def _phased_x(phase_exponent, exponent):
    if (phase_exponent, exponent) != (0.25, 0.5):
        raise NotImplementedError(
            "only PhasedXPowGate(0.25, 0.5) (= W^1/2) appears in these files")
    return _Gate("hz_1_2")


def _shim_namespace(collector):
    shim = types.ModuleType("cirq")
    shim.GridQubit = _Qubit
    shim.X = _PowBase("X")
    shim.Y = _PowBase("Y")
    shim.PhasedXPowGate = _phased_x
    shim.Rz = lambda rads: _Gate("rz", (float(rads),))
    shim.FSimGate = lambda theta, phi: _Gate("fsim", (float(theta), float(phi)))
    shim.Moment = lambda operations: list(operations)
    shim.Circuit = lambda moments: collector(moments)
    return shim


def load_cirq_circuit(path):
    """Parse a generated cirq circuit file.

    Returns ``(n, layers)``: qubit count and layers of
    ``(gate_name, qubit_indices, params)``, with qubits numbered by the
    file's QUBIT_ORDER (row-major grid order).
    """
    import sys

    captured = {}
    shim = _shim_namespace(lambda moments: captured.setdefault("moments", moments))
    with open(path) as f:
        src = f.read()
    env = {"cirq": shim, "np": np, "math": math}
    # the generated files 'import cirq' themselves; route that import to the
    # shim for the duration of the exec (restoring any real cirq afterwards)
    prev = sys.modules.get("cirq")
    sys.modules["cirq"] = shim
    try:
        exec(compile(src, str(path), "exec"), env)
    finally:
        if prev is None:
            del sys.modules["cirq"]
        else:
            sys.modules["cirq"] = prev
    qubit_order = env.get("QUBIT_ORDER")
    moments = captured.get("moments")
    if moments is None:
        circ = env.get("CIRCUIT")
        moments = circ if isinstance(circ, list) else None
    assert moments is not None, "no cirq.Circuit found in file"
    index = {q: i for i, q in enumerate(qubit_order)}
    layers = []
    for moment in moments:
        layer = []
        for op in moment:
            layer.append((op.name, tuple(index[q] for q in op.qubits), op.params))
        layers.append(layer)
    return len(qubit_order), layers
