"""Sparse (big-batch) scheme tests: batch metadata, all three merge regimes,
slicing interplay, and end-to-end amplitude correctness vs the oracle."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from artensor_tpu.circuits import TensorNetworkCircuit
from artensor_tpu.runtime.sparse import (
    _bits_to_ints,
    _ints_to_bits,
    _lookup_positions,
)
from artensor_tpu.simulation import quantum_circuit_simulation

REF_N12 = "/root/reference/tests/circuit_n12_m14_s0_e0_pEFGH.qsim"
if not os.path.exists(REF_N12):  # self-contained fallback fixture
    REF_N12 = os.path.join(os.path.dirname(__file__),
                           "data", "circuit_n12_rcs.qsim")


def test_bit_helpers_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(37, 9)).astype(np.uint8)
    vals = _bits_to_ints(bits)
    assert np.array_equal(_ints_to_bits(vals, 9), bits)
    assert _bits_to_ints(np.zeros((3, 0), dtype=np.uint8)).tolist() == [0, 0, 0]
    # MSB-first convention matches np.binary_repr / int(s, 2)
    assert _bits_to_ints(np.array([[1, 0, 1]], dtype=np.uint8))[0] == 0b101


def test_lookup_positions():
    hay = np.array([5, 1, 9, 3])
    needles = np.array([9, 5, 3, 3, 1])
    pos = _lookup_positions(hay, needles)
    assert np.array_equal(hay[pos], needles)


def _oracle(fn):
    return TensorNetworkCircuit(fn).state_vec().reshape(-1)


@pytest.mark.skipif(not os.path.exists(REF_N12), reason="reference data absent")
@pytest.mark.parametrize("sc_target", [30, 14, 11])
def test_n12_sparse_all_regimes(sc_target):
    """sc_target=30: cross-product only; 14: aligned gathers; 11: chunked
    gathers + sliced bonds.  All must agree with the exact oracle."""
    want = _oracle(REF_N12)
    rng = np.random.default_rng(7)
    picks = rng.choice(4096, size=200, replace=False)
    bitstrings = [np.binary_repr(p, 12) for p in picks]
    res, bits = quantum_circuit_simulation(
        REF_N12, bitstrings, sc_target=sc_target, trial_num=2,
        dtype=np.complex64, parallel=False, iters=6)
    res = np.asarray(res)
    assert sorted(bits) == sorted(bitstrings)
    for amp, bs in zip(res, bits):
        assert abs(amp - want[int(bs, 2)]) < 2e-6, bs


@pytest.mark.skipif(not os.path.exists(REF_N12), reason="reference data absent")
def test_n12_sparse_full_batch():
    """Every one of the 4096 bitstrings in one batch == the dense result."""
    want = _oracle(REF_N12)
    bitstrings = [np.binary_repr(k, 12) for k in range(4096)]
    res, bits = quantum_circuit_simulation(
        REF_N12, bitstrings, sc_target=30, trial_num=2,
        dtype=np.complex64, parallel=False, iters=6)
    res = np.asarray(res)
    got = np.empty(4096, dtype=np.complex64)
    for amp, bs in zip(res, bits):
        got[int(bs, 2)] = amp
    assert np.abs(got - want).max() < 2e-6


@pytest.mark.skipif(not os.path.exists(REF_N12), reason="reference data absent")
def test_sparse_duplicate_bitstrings_deduped():
    want = _oracle(REF_N12)
    bitstrings = ["100001000001", "100001000001", "000101111011"]
    res, bits = quantum_circuit_simulation(
        REF_N12, bitstrings, sc_target=30, trial_num=1,
        dtype=np.complex64, parallel=False, iters=4)
    assert len(bits) == 2  # unique only
    for amp, bs in zip(np.asarray(res), bits):
        assert abs(amp - want[int(bs, 2)]) < 2e-6


NONMONOTONE_QSIM = """3
0 h 0
0 h 1
0 h 2
1 fs 0 1 0.5 0.2
1 t 2 0.3
2 fs 1 2 0.5 0.2
2 t 0 0.7
3 x_1_2 0
3 y_1_2 1
3 hz_1_2 2
4 rz 0 0.3
5 t 0 0.9
"""


def test_nonmonotone_final_qubit_renumbering():
    """Trailing 1q-gate chains on one qubit make simplify() re-insert that
    qubit's final tensor at the dict end, so renumbered final-qubit ids are
    NOT ascending in qubit order.  The sparse scheme must map batch axes by
    the qubit-indexed final_qubits list, not by sorted tensor id (regression:
    sorting silently permuted the amplitudes across bitstrings)."""
    from artensor_tpu.network import NumericalTensorNetwork

    circ = TensorNetworkCircuit(NONMONOTONE_QSIM)
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    _, fq2 = ntn.simplify("sparse")
    assert fq2 != sorted(fq2), "fixture must exercise non-monotone renumbering"

    sv = circ.state_vec().reshape(-1)
    bits = [np.binary_repr(i, 3) for i in range(8)]
    amps, out_bits = quantum_circuit_simulation(
        NONMONOTONE_QSIM, bits, sc_target=30, trial_num=2, parallel=False,
        iters=8, mode="complex", dtype=np.complex128)
    exact = np.array([sv[int(b, 2)] for b in out_bits])
    assert np.abs(np.asarray(amps) - exact).max() < 1e-12


def test_scheme_with_gatherk_kernels_end_to_end(monkeypatch):
    """Force gather-K eligibility at test scale (thresholds lowered) and
    check the full sparse pipeline — time-ordered orders, kernel plans,
    interpret-mode Pallas execution inside the sliced scan — against the
    exact state vector."""
    from artensor_tpu.circuits import TensorNetworkCircuit
    from artensor_tpu.circuits.random_circuits import random_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.planner import find_order
    from artensor_tpu.runtime import gatherk as gk
    from artensor_tpu.runtime.executor import (
        build_slicing_axes, make_sliced_runner, stage_tensors)
    from artensor_tpu.runtime.sparse import (
        contraction_scheme_sparse, execute_sparse)

    monkeypatch.setattr(gk, "MIN_X_ELEMS", 1 << 8)
    monkeypatch.setattr(gk, "SLACK", 1e9)

    n, layers = random_circuit(3, 4, 8, seed=13)
    c = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = c.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    rng = np.random.default_rng(4)
    bits = [np.binary_repr(b, n)
            for b in rng.choice(2 ** n, 48, replace=False)]
    order, sliced, ctree = find_order(
        tb2, ntn.bond_dims, fq2, max_bitstrings=48, sc_target=10,
        trials=2, iters=6, betas=np.linspace(3, 21, 12), slicing_repeat=1,
        parallel=False)
    steps, ob, bits_sorted = contraction_scheme_sparse(
        ctree, bits, sc_target=10)
    n_gk = sum(1 for s in steps if isinstance(s.lane, gk.GKPlan))
    assert n_gk >= 1, "no gather-K plans attached at forced thresholds"
    field = make_field(np.complex64, "highest", "split")
    staged = stage_tensors(
        field, [ntn.tensors[i] for i in range(len(ntn.tensors))])
    axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2)
    run = make_sliced_runner(execute_sparse, steps, axes, len(sliced),
                             (len(bits_sorted),), field)
    amps = field.unwrap(run(staged)).reshape(-1)
    want = c.state_vec().reshape(-1)
    for a, bs in zip(amps, bits_sorted):
        assert abs(a - want[int(bs, 2)]) < 2e-5, (bs, a, want[int(bs, 2)])


PLAN_SC22 = os.path.join(os.path.dirname(__file__), "..",
                         "plans", "n30_m14_sparse_sc22.json")


@pytest.mark.skipif(not os.path.exists(PLAN_SC22), reason="plan absent")
def test_negotiation_invariants_on_headline_plan():
    """Producer-order negotiation must never lose a pass-1 kernel, never
    worsen the wall estimate, and must leave the contraction semantics
    (step pairing, output bond set, bitstring batch) untouched."""
    from artensor_tpu import plan_io
    from artensor_tpu.runtime import metrics as mt
    from artensor_tpu.runtime.sparse import (_compile_sparse,
                                             contraction_scheme_sparse)

    order, sliced, ctree = plan_io.load_plan(PLAN_SC22)
    bits = [np.binary_repr(i, 30) for i in range(256)]
    steps1, ob1, bs1, req = _compile_sparse(ctree, bits, 22, True, None)
    assert req, "headline plan should generate layout requests"
    # pass-1 baseline on the SAME (fused) order the pipeline negotiates
    steps0, ob0, bs0 = contraction_scheme_sparse(ctree, bits, sc_target=22,
                                                 negotiate=False)
    steps2, ob2, bs2 = contraction_scheme_sparse(ctree, bits, sc_target=22)
    est1 = mt.scheme_wall_estimate(steps1, 0)[0]
    est0 = mt.scheme_wall_estimate(steps0, 0)[0]
    est2 = mt.scheme_wall_estimate(steps2, 0)[0]
    assert est2 <= min(est0, est1) * (1 + 1e-9)
    assert len(steps0) == len(steps2)
    for a, b in zip(steps0, steps2):
        assert (a.i, a.j) == (b.i, b.j)
        if a.lane is not None:
            assert b.lane is not None   # hard guard: no kernel lost
    assert set(ob0) == set(ob2) == set(ob1)
    assert bs0 == bs2 == bs1


@pytest.mark.skipif(not os.path.exists(PLAN_SC22), reason="plan absent")
def test_pair_iy_steps_request_grouped_output_order():
    """A step rejected by the pair kernel solely on its own interleaved
    output order must offer grouped (rows_i | rows_j) candidates to the
    negotiation driver, each a permutation of the step's bonds."""
    from artensor_tpu import plan_io
    from artensor_tpu.runtime.sparse import _compile_sparse

    order, sliced, ctree = plan_io.load_plan(PLAN_SC22)
    bits = [np.binary_repr(i, 30) for i in range(256)]
    steps, _, _, req = _compile_sparse(ctree, bits, 22, True, None)
    pair_iy = [k for k, s in enumerate(steps)
               if s.lane is None and s.note and "/pair:pair-iy" in s.note]
    assert pair_iy, "plan is expected to have a pair-iy residual step"
    for k in pair_iy:
        assert k in req
        for cand in req[k]:
            steps_k, _, _, _ = _compile_sparse(ctree, bits, 22, True,
                                               {k: cand})
            assert len(steps_k) == len(steps)
