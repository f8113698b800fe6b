"""Runtime tests: dense scheme execution, slicing, multi-device sharding.

Runs on the CPU platform with 8 virtual devices (conftest.py).  Correctness
is always against the exact state-vector oracle or the reference's n12
amplitude table.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from artensor_tpu.circuits import TensorNetworkCircuit
from artensor_tpu.network import NumericalTensorNetwork
from artensor_tpu.planner import find_order
from artensor_tpu.ops.field import make_field
from artensor_tpu.runtime import (
    build_slicing_axes,
    compile_dense,
    contraction_scheme,
)

FIELD = make_field(np.complex128, "highest", "split")

REF_N12 = "/root/reference/tests/circuit_n12_m14_s0_e0_pEFGH.qsim"
if not os.path.exists(REF_N12):  # self-contained fallback fixture
    REF_N12 = os.path.join(os.path.dirname(__file__),
                           "data", "circuit_n12_rcs.qsim")

SMALL = """4
0 h 0
0 h 1
0 x_1_2 2
0 y_1_2 3
1 fsim 0 1 1.5 0.5
1 fsim 2 3 1.4 0.6
2 rz 0 0.3
2 hz_1_2 1
2 t 2 0.25
2 y_1_2 3
3 fsim 1 2 1.2 0.3
4 x_1_2 0
4 hz_1_2 1
4 y_1_2 2
4 x_1_2 3
"""

PLAN_KW = dict(trials=2, iters=6, betas=np.linspace(3, 21, 12),
               slicing_repeat=2, parallel=False)


def _plan_and_arrays(circuit, pattern="normal", sc_target=30, dtype=np.complex128):
    tensors, tb, bd, fq = circuit.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify(pattern)
    order, sliced, ctree = find_order(
        tb2, ntn.bond_dims, fq2, sc_target=sc_target, **PLAN_KW)
    from artensor_tpu.runtime.executor import stage_tensors
    arrays = stage_tensors(FIELD, [ntn.tensors[i] for i in range(len(ntn.tensors))])
    return tb2, sliced, ctree, arrays


def test_dense_executor_matches_oracle():
    c = TensorNetworkCircuit(SMALL)
    tb2, sliced, ctree, arrays = _plan_and_arrays(c)
    assert sliced == []
    steps, out_bonds = contraction_scheme(ctree)
    run = compile_dense(steps, [], 0, (2,) * len(out_bonds), FIELD)
    result = FIELD.unwrap(run(arrays)).reshape((2,) * len(out_bonds))
    perm = np.argsort([int(str(b).split("-")[1]) for b in out_bonds])
    got = result.transpose(perm).reshape(-1)
    want = c.state_vec().reshape(-1)
    assert np.allclose(got, want, atol=1e-12)


@pytest.mark.skipif(not os.path.exists(REF_N12), reason="reference data absent")
def test_closed_circuit_sliced_contraction():
    # closed n12 amplitude with a tight budget: slicing must engage
    c = TensorNetworkCircuit(REF_N12, final_state="100001000001")
    want = c.state_vec()
    tb2, sliced, ctree, arrays = _plan_and_arrays(c, sc_target=8)
    assert len(sliced) >= 1  # tight budget forces slicing
    assert ctree.complexity()[1] <= 8
    steps, out_bonds = contraction_scheme(ctree)
    assert out_bonds == []
    axes = build_slicing_axes(tb2, sliced)
    run = compile_dense(steps, axes, len(sliced), (), FIELD)
    got = complex(FIELD.unwrap(run(arrays)).reshape(()))
    assert abs(got - complex(want)) < 1e-10


@pytest.mark.skipif(not os.path.exists(REF_N12), reason="reference data absent")
def test_sharded_slices_match_single_device():
    from artensor_tpu.parallel import make_mesh, run_sliced_contraction

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    c = TensorNetworkCircuit(REF_N12, final_state="000101111011")
    tb2, sliced, ctree, arrays = _plan_and_arrays(c, sc_target=8)
    k = len(sliced)
    assert 2 ** k >= 8, "need at least one slice per device"
    steps, _ = contraction_scheme(ctree)
    axes = build_slicing_axes(tb2, sliced)
    single = complex(FIELD.unwrap(compile_dense(steps, axes, k, (), FIELD)(arrays)))
    mesh = make_mesh(8)
    sharded = complex(FIELD.unwrap(
        run_sliced_contraction(arrays, steps, axes, k, (), mesh, field=FIELD)))
    assert abs(single - sharded) < 1e-10
    assert abs(single - complex(c.state_vec())) < 1e-12


def test_build_slicing_axes_shared_tensor():
    # one tensor carrying two sliced bonds: later axes must shift
    tb = {0: ["a", "b", "c"], 1: ["a"], 2: ["b"], 3: ["c"]}
    specs = build_slicing_axes(tb, ["a", "c"])
    entries0 = {(t, ax): dims for t, ax, dims, _ in specs[0]}
    entries1 = {(t, ax): dims for t, ax, dims, _ in specs[1]}
    # bond 'a': tensor0 axis 0 (dims pre-removal (2,2,2)), tensor1 axis 0
    assert entries0[(0, 0)] == (2, 2, 2) and (1, 0) in entries0
    # bond 'c': tensor0's axis 2 shifts to 1 after 'a' was removed
    assert entries1[(0, 1)] == (2, 2) and (3, 0) in entries1
    # physical shapes after removal are flat 2-D / 1-D
    phys = {t: p for t, ax, d, p in specs[1]}
    assert phys[0] == (2,)
    # numeric check: select bits (1, 0) both ways
    x = np.arange(8).reshape(2, 2, 2)
    got = x[1][:, 0]  # slice a=1 then c=0 with shifted axis
    want = x[1, :, 0]
    assert np.array_equal(got, want)


def test_open_bonds_never_sliced():
    # dense open-output circuit with a budget below the open-leg count:
    # the planner must NOT slice output legs (that would marginalize them)
    c = TensorNetworkCircuit(SMALL)
    tensors, tb, bd, fq = c.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("normal")
    order, sliced, ctree = find_order(
        tb2, ntn.bond_dims, fq2, sc_target=2, **PLAN_KW)
    open_bonds = {b for b, ts in ctree.tn.bond_tensors.items() if len(ts) == 1}
    for b in sliced:
        assert b not in open_bonds
    # all four output legs still reach the root
    assert len(ctree.root.boundary) == 4


@pytest.mark.skipif(not os.path.exists(REF_N12), reason="reference data absent")
def test_n12_dense_full_amplitudes():
    from artensor_tpu.simulation import quantum_circuit_simulation
    from test_circuits import N12_AMPLITUDES

    res, bits = quantum_circuit_simulation(
        REF_N12, [], sc_target=30, trial_num=2, dtype=np.complex64,
        parallel=False, iters=8)
    assert bits == []
    amps = np.asarray(res).reshape(-1)
    assert amps.shape == (4096,)
    for bs, amp in N12_AMPLITUDES.items():
        assert np.allclose(amps[int(bs, 2)], amp, rtol=1e-4, atol=1e-7), bs
    # normalization survives the pipeline
    assert np.isclose(np.linalg.norm(amps), 1.0, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF_N12), reason="reference data absent")
def test_slice_batch_matches_sequential():
    # vmapped slice groups must give identical sums to the sequential scan
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime.executor import make_sliced_runner, execute_dense

    c = TensorNetworkCircuit(REF_N12, final_state="100001000001")
    tb2, sliced, ctree, arrays = _plan_and_arrays(c, sc_target=8)
    k = len(sliced)
    assert 2 ** k % 4 == 0
    steps, _ = contraction_scheme(ctree)
    axes = build_slicing_axes(tb2, sliced)
    seq = jax.jit(make_sliced_runner(execute_dense, steps, axes, k, (), FIELD))
    bat = jax.jit(make_sliced_runner(execute_dense, steps, axes, k, (), FIELD,
                                     slice_batch=4))
    a = complex(FIELD.unwrap(seq(arrays)).reshape(()))
    b = complex(FIELD.unwrap(bat(arrays)).reshape(()))
    assert abs(a - b) < 1e-12


def test_hyperedge_network_executes_correctly():
    """Bonds shared by 3+ tensors (hyperedges) flow through the batch-label
    path of the lowering; validate numerically against a direct einsum."""
    from artensor_tpu.runtime.executor import (
        execute_dense, make_sliced_runner, stage_tensors)

    rng = np.random.default_rng(3)
    # h is a 3-tensor hyperedge; g is an open output bond
    tb = {0: ["a", "h"], 1: ["a", "b", "h"], 2: ["b", "c", "h"],
          3: ["c", "g"]}
    dims = {b: 2.0 for b in "abchg"}
    arrays = {t: rng.standard_normal([2] * len(bs))
              + 1j * rng.standard_normal([2] * len(bs))
              for t, bs in tb.items()}
    order, sliced, ctree = find_order(
        tb, dims, sc_target=30, trials=2, iters=4,
        betas=np.linspace(3, 21, 8), parallel=False)
    steps, out_bonds = contraction_scheme(ctree)
    staged = stage_tensors(FIELD, [arrays[t] for t in range(4)])
    run = jax.jit(make_sliced_runner(
        execute_dense, steps, [], 0, (2,) * len(out_bonds), FIELD))
    got = FIELD.unwrap(run(staged)).reshape((2,) * len(out_bonds))
    lab = {b: k for k, b in enumerate("abchg")}
    want = np.einsum(
        arrays[0], [lab[b] for b in tb[0]],
        arrays[1], [lab[b] for b in tb[1]],
        arrays[2], [lab[b] for b in tb[2]],
        arrays[3], [lab[b] for b in tb[3]],
        [lab[b] for b in out_bonds])
    assert np.abs(got - want).max() < 1e-12


def test_hyperedge_with_slicing_on_hyperbond():
    """Slicing a degree-3 hyperbond must still sum correctly."""
    from artensor_tpu.planner import clone_network
    from artensor_tpu.planner import ContractionTree
    from artensor_tpu.network import AbstractTensorNetwork
    from artensor_tpu.runtime.executor import (
        execute_dense, make_sliced_runner, stage_tensors)

    rng = np.random.default_rng(4)
    tb = {0: ["a", "h"], 1: ["a", "b", "h"], 2: ["b", "h"]}
    dims = {b: 2.0 for b in "abh"}
    arrays = {t: rng.standard_normal([2] * len(bs)) for t, bs in tb.items()}
    tn = AbstractTensorNetwork(tb, dims)
    tn.slicing("h")
    ctree = ContractionTree(tn, [(0, 1), (0, 2)])
    steps, out_bonds = contraction_scheme(ctree)
    assert out_bonds == []
    axes = build_slicing_axes(tb, ["h"])
    staged = stage_tensors(FIELD, [arrays[t] for t in range(3)])
    run = jax.jit(make_sliced_runner(execute_dense, steps, axes, 1, (), FIELD))
    got = complex(FIELD.unwrap(run(staged)).reshape(()))
    lab = {"a": 0, "b": 1, "h": 2}
    want = np.einsum(arrays[0], [0, 2], arrays[1], [0, 1, 2],
                     arrays[2], [1, 2], [])
    assert abs(got - complex(want)) < 1e-12


def test_sharded_sparse_matches_single_device():
    """Sparse (big-batch) executor sharded over 8 virtual devices == the
    single-device run, including a slice count that does NOT divide the
    device count (padded duplicate ids must be masked, never silently
    falling back to one device)."""
    from artensor_tpu.circuits.random_circuits import random_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.parallel import make_mesh, run_sliced_contraction
    from artensor_tpu.planner import find_order
    from artensor_tpu.runtime.executor import make_sliced_runner, stage_tensors
    from artensor_tpu.runtime.sparse import (
        contraction_scheme_sparse,
        execute_sparse,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    n, layers = random_circuit(3, 3, 6, seed=21)
    c = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = c.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    rng = np.random.default_rng(3)
    bits = [np.binary_repr(b, n) for b in rng.choice(2 ** n, 40, replace=False)]
    order, sliced, ctree = find_order(
        tb2, ntn.bond_dims, fq2, max_bitstrings=40, sc_target=6,
        trials=2, iters=5, betas=np.linspace(3, 21, 10), slicing_repeat=1,
        parallel=False)
    # force a slice count that does not divide 8: add bonds until 2^k = 32
    while len(ctree.tn.sliced) < 5:
        cands = ctree.slice_candidates()
        if not cands:
            break
        ctree.slicing(sorted(cands, key=str)[0])
    sliced = list(ctree.tn.sliced.keys())
    k = len(sliced)
    steps, ob, bits_sorted = contraction_scheme_sparse(ctree, bits, sc_target=6)
    axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2)
    arrays = stage_tensors(FIELD, [ntn.tensors[i] for i in range(len(ntn.tensors))])
    out_shape = (len(bits_sorted),)
    single = FIELD.unwrap(jax.jit(make_sliced_runner(
        execute_sparse, steps, axes, k, out_shape, FIELD))(arrays)).reshape(-1)
    # 2^5 = 32 slices over a 5-device mesh: 32 % 5 != 0 -> padded ids
    mesh5 = make_mesh(5)
    sharded5 = FIELD.unwrap(run_sliced_contraction(
        arrays, steps, axes, k, out_shape, mesh5,
        field=FIELD, execute=execute_sparse)).reshape(-1)
    mesh8 = make_mesh(8)
    sharded8 = FIELD.unwrap(run_sliced_contraction(
        arrays, steps, axes, k, out_shape, mesh8,
        field=FIELD, execute=execute_sparse)).reshape(-1)
    assert np.abs(single - sharded5).max() < 1e-12
    assert np.abs(single - sharded8).max() < 1e-12
    want = c.state_vec().reshape(-1)
    for amp, bs in zip(single, bits_sorted):
        assert abs(amp - want[int(bs, 2)]) < 1e-10


def test_dispatch_batches_concurrent():
    """Batch groups (distinct compiled programs) land on different devices
    and all dispatches are issued before any result is gathered."""
    from artensor_tpu.parallel import dispatch_batches

    if len(jax.devices()) < 4:
        pytest.skip("needs multiple devices")
    devices_seen = []

    def make_runner(plan):
        scale = plan

        def runner(dev):
            x = jax.device_put(jnp.arange(16.0) * scale, dev)
            devices_seen.append(dev)
            return jax.jit(lambda v: (v * v).sum())(x)

        return runner

    results = dispatch_batches(make_runner, [1.0, 2.0, 3.0, 4.0])
    want = (np.arange(16.0) ** 2).sum()
    for g, r in enumerate(results):
        assert abs(float(r) - want * (g + 1) ** 2) < 1e-6
    assert len(set(devices_seen)) >= 4  # spread over devices


def _open_sim(seed=31, n_rows=2, n_cols=3, cycles=6, sc_target=6):
    from artensor_tpu.circuits.random_circuits import random_circuit
    from artensor_tpu.simulation import TensorNetworkSimulation

    n, layers = random_circuit(n_rows, n_cols, cycles, seed=seed)
    c = TensorNetworkCircuit((n, layers))
    sim = TensorNetworkSimulation.from_circuit(c, bitstrings=())
    sim.prepare_contraction(sc_target=sc_target, trials=2, iters=5,
                            betas=tuple(np.linspace(3, 21, 10)),
                            slicing_repeat=1, parallel=False)
    return n, c, sim


def test_dense_output_sharded_mesh():
    """Output legs sharded over the 8-device mesh: the concatenated blocks
    equal the full state (BASELINE config 2 mechanism: each device holds a
    disjoint 2^(n-d) block of the amplitude tensor)."""
    from artensor_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    n, c, sim = _open_sim()
    full = sim.contraction_output_sharded(
        make_mesh(8), dtype=np.complex128)
    want = c.state_vec()
    assert np.abs(full - want).max() < 1e-10
    # sim state intact: the plain contraction still works afterwards
    plain = sim.contraction(dtype=np.complex128)
    assert np.abs(plain - want).max() < 1e-10


def test_dense_output_blocks_single_device():
    """Single-device walk over disjoint output blocks reassembles the full
    state (how one chip computes an output larger than its HBM)."""
    n, c, sim = _open_sim(seed=32)
    want = c.state_vec()
    got = np.zeros((2,) * n, dtype=np.complex128)
    seen = 0
    for bits, qubits, block in sim.contraction_output_blocks(
            3, dtype=np.complex128):
        idx = [slice(None)] * n
        for q, b in zip(qubits, bits):
            idx[q] = int(b)
        got[tuple(idx)] = block
        seen += 1
    assert seen == 8
    assert np.abs(got - want).max() < 1e-10


def test_generic_integer_bond_labels():
    """tensor_network_contraction on an open network with integer bond
    labels (the reference notebook's edge-index convention) must not crash
    on the output permutation (regression: _qubit_of assumed wire labels)."""
    from artensor_tpu.simulation import tensor_network_contraction

    rng = np.random.default_rng(0)
    # open chain of rank-3 tensors (not simplified away): labels are ints
    t0 = rng.random((2, 2, 2)) + 1j * rng.random((2, 2, 2))
    t1 = rng.random((2, 2, 2)) + 1j * rng.random((2, 2, 2))
    t2 = rng.random((2, 2, 2)) + 1j * rng.random((2, 2, 2))
    tensors = {0: t0, 1: t1, 2: t2}
    tensor_bonds = {0: [0, 1, 4], 1: [1, 2, 5], 2: [2, 3, 6]}
    bond_dims = {b: 2.0 for b in range(7)}
    res, bits = tensor_network_contraction(
        tensors, tensor_bonds, bond_dims, (), (),
        sc_target=30, trial_num=1, iters=3, parallel=False,
        dtype=np.complex128)
    # open legs 0,3,4,5,6 -> output axes in ascending label order
    want = np.einsum("abe,bcf,cdg->adefg", t0, t1, t2)
    assert bits == []
    assert np.abs(np.asarray(res) - want).max() < 1e-12

    # degenerate fully-simplifiable chain (rank-2 tensors): single-tensor
    # network after simplify; must still return the correct matrix
    m0 = rng.random((2, 2)) + 1j * rng.random((2, 2))
    m1 = rng.random((2, 2)) + 1j * rng.random((2, 2))
    m2 = rng.random((2, 2)) + 1j * rng.random((2, 2))
    res2, _ = tensor_network_contraction(
        {0: m0, 1: m1, 2: m2}, {0: [0, 1], 1: [1, 2], 2: [2, 3]},
        {b: 2.0 for b in range(4)}, (), (),
        sc_target=30, trial_num=1, iters=3, parallel=False,
        dtype=np.complex128)
    want2 = np.einsum("ab,bc,cd->ad", m0, m1, m2)
    assert np.abs(np.asarray(res2) - want2).max() < 1e-12


def test_dense_output_sharded_preplanned():
    """prepare_output_sharded: the planner runs with the output legs
    pre-sliced (sc budget applies per block) and the sharded result still
    equals the full state."""
    from artensor_tpu.parallel import make_mesh
    from artensor_tpu.circuits.random_circuits import random_circuit
    from artensor_tpu.simulation import TensorNetworkSimulation

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    n, layers = random_circuit(2, 3, 6, seed=33)
    c = TensorNetworkCircuit((n, layers))
    sim = TensorNetworkSimulation.from_circuit(c, bitstrings=())
    sim.prepare_output_sharded(3, sc_target=5, trials=2, iters=5,
                               betas=tuple(np.linspace(3, 21, 10)),
                               slicing_repeat=1, parallel=False)
    assert sim.ctree.complexity()[1] <= max(5, n - 3)
    full = sim.contraction_output_sharded(make_mesh(8), d_out=3,
                                          dtype=np.complex128)
    want = c.state_vec()
    assert np.abs(full - want).max() < 1e-10


def test_compile_failure_classifier():
    from artensor_tpu.simulation import _is_compile_failure

    assert _is_compile_failure(RuntimeError(
        "INTERNAL: http://127.0.0.1:8093/remote_compile: HTTP 500"))
    assert _is_compile_failure(RuntimeError(
        "XLA:TPU compile permanent error. Ran out of memory in memory "
        "space vmem. Used 317.98M of 128.00M vmem."))
    assert not _is_compile_failure(ValueError("shapes mismatch"))
    assert not _is_compile_failure(FloatingPointError("overflow"))


def test_dense_negotiation_invariants_on_block_plan():
    """Dense producer-order negotiation: never lose a pass-1 kernel,
    never worsen the wall estimate, keep step pairing and the output
    bond set."""
    import os

    from artensor_tpu import plan_io
    from artensor_tpu.runtime import metrics as mt
    from artensor_tpu.runtime.scheme import _compile_dense, contraction_scheme

    path = os.path.join(os.path.dirname(__file__), "..", "plans",
                        "n30_m14_dense_blocks64_sc26.json")
    if not os.path.exists(path):
        import pytest
        pytest.skip("plan absent")
    _, _, ctree = plan_io.load_plan(path)
    s1, ob1, req = _compile_dense(ctree, True, None)
    assert req, "block plan should generate layout requests"
    # negotiation-only invariants (fusion off: it reorders pairs)
    s2, ob2 = contraction_scheme(ctree, fuse=False)
    assert mt.scheme_wall_estimate(s2, 0)[0] \
        <= mt.scheme_wall_estimate(s1, 0)[0] * (1 + 1e-9)
    assert len(s1) == len(s2)
    for a, b in zip(s1, s2):
        assert (a.i, a.j) == (b.i, b.j)
        if a.lane is not None:
            assert b.lane is not None
    assert set(ob1) == set(ob2)
    # fusion must only ever improve the compiled estimate (each rewrite
    # is arbitrated against it) and keep the output bond set
    s3, ob3 = contraction_scheme(ctree)
    assert mt.scheme_wall_estimate(s3, 0)[0] \
        <= mt.scheme_wall_estimate(s2, 0)[0] * (1 + 1e-9)
    assert set(ob3) == set(ob2)
