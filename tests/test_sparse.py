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
