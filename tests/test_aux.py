"""Aux subsystems: plan IO, rescaled execution, checkpoint/resume, metrics,
random circuits, CLI, field-mode cross-checks."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from artensor_tpu import plan_io
from artensor_tpu.circuits import TensorNetworkCircuit
from artensor_tpu.circuits.random_circuits import random_circuit
from artensor_tpu.network import NumericalTensorNetwork
from artensor_tpu.ops.field import make_field
from artensor_tpu.planner import find_order
from artensor_tpu.runtime import build_slicing_axes, contraction_scheme
from artensor_tpu.runtime.executor import make_sliced_runner, stage_tensors, execute_dense

PLAN_KW = dict(trials=2, iters=5, betas=np.linspace(3, 21, 10),
               slicing_repeat=1, parallel=False)


@pytest.fixture(scope="module")
def closed_circuit():
    n, layers = random_circuit(3, 3, 6, seed=11)
    bits = "0" * n
    c = TensorNetworkCircuit((n, layers), final_state=bits)
    tensors, tb, bd, fq = c.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("normal")
    order, sliced, ctree = find_order(
        tb2, ntn.bond_dims, fq2, sc_target=3, **PLAN_KW)
    want = complex(c.state_vec())
    return ntn, tb2, fq2, order, sliced, ctree, want


def test_plan_io_roundtrip(tmp_path, closed_circuit):
    ntn, tb2, fq2, order, sliced, ctree, want = closed_circuit
    path = tmp_path / "plan.json"
    plan_io.save_plan(path, ctree, meta={"note": "test"})
    order2, sliced2, ctree2 = plan_io.load_plan(path)
    assert order2 == [tuple(p) for p in ctree.to_order_bfs()]
    assert set(sliced2) == set(sliced)
    assert ctree2.complexity() == pytest.approx(ctree.complexity(), abs=1e-9)
    # the reloaded plan executes to the same amplitude
    steps, ob = contraction_scheme(ctree2)
    field = make_field(np.complex128, "highest", "split")
    staged = stage_tensors(field, [ntn.tensors[i] for i in range(len(ntn.tensors))])
    axes = build_slicing_axes(tb2, sliced2)
    run = jax.jit(make_sliced_runner(
        execute_dense, steps, axes, len(sliced2), (), field))
    got = complex(field.unwrap(run(staged)).reshape(()))
    assert abs(got - want) < 1e-10


def test_rescaled_execution_matches_plain(closed_circuit):
    from artensor_tpu.runtime.rescaled import make_rescaled_runner
    from artensor_tpu.runtime.segmented import apply_dense_step

    ntn, tb2, fq2, order, sliced, ctree, want = closed_circuit
    steps, _ = contraction_scheme(ctree)
    field = make_field(np.complex128, "highest", "split")
    staged = stage_tensors(field, [ntn.tensors[i] for i in range(len(ntn.tensors))])
    axes = build_slicing_axes(tb2, sliced)
    run = jax.jit(make_rescaled_runner(
        apply_dense_step, steps, axes, len(sliced), (), field))
    tensor, factor = run(staged)
    got = complex(field.unwrap(tensor).reshape(())) * 10.0 ** float(factor)
    assert abs(got - want) < 1e-8
    # mantissa stays O(1)
    assert abs(complex(field.unwrap(tensor).reshape(()))) < 10.0


def test_checkpoint_resume(tmp_path, closed_circuit):
    from artensor_tpu.runtime.checkpoint import run_sliced_checkpointed

    ntn, tb2, fq2, order, sliced, ctree, want = closed_circuit
    k = len(sliced)
    assert k >= 1
    steps, _ = contraction_scheme(ctree)
    field = make_field(np.complex128, "highest", "split")
    staged = stage_tensors(field, [ntn.tensors[i] for i in range(len(ntn.tensors))])
    axes = build_slicing_axes(tb2, sliced)
    run = jax.jit(make_sliced_runner(execute_dense, steps, axes, k, (), field))
    ckpt = str(tmp_path / "acc.npz")

    # interrupt after the first chunk, then resume
    calls = []

    def boom(done, total):
        calls.append(done)
        if len(calls) == 1:
            raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        run_sliced_checkpointed(run, staged, k, (), field, ckpt,
                                chunk=1, progress=boom)
    assert os.path.exists(ckpt)
    saved = np.load(ckpt)
    assert int(saved["next_slice"]) == 1
    acc = run_sliced_checkpointed(run, staged, k, (), field, ckpt, chunk=1)
    got = complex(field.unwrap(acc).reshape(()))
    assert abs(got - want) < 1e-10
    assert not os.path.exists(ckpt)  # cleaned up on success


def test_metrics_report(closed_circuit):
    from artensor_tpu.runtime import metrics as mt

    ntn, tb2, fq2, order, sliced, ctree, want = closed_circuit
    steps, _ = contraction_scheme(ctree)
    flops = mt.scheme_flops(steps)
    assert flops > 0
    census = mt.reorder_census(steps)
    assert sum(census.values()) == len(steps)
    rep = mt.ContractionReport(predicted_flops=flops, wall_s=1.0,
                               num_steps=len(steps), reorders=census)
    assert "steps" in rep.summary()


def test_field_modes_agree(closed_circuit):
    ntn, tb2, fq2, order, sliced, ctree, want = closed_circuit
    steps, _ = contraction_scheme(ctree)
    axes = build_slicing_axes(tb2, sliced)
    results = {}
    for mode in ("split", "complex", "fused"):
        for algo in ("naive", "karatsuba"):
            if mode == "fused" and algo == "karatsuba":
                continue  # fused is one dot; no karatsuba decomposition
            field = make_field(np.complex128, "highest", mode, algo)
            staged = stage_tensors(
                field, [ntn.tensors[i] for i in range(len(ntn.tensors))])
            run = jax.jit(make_sliced_runner(
                execute_dense, steps, axes, len(sliced), (), field))
            results[(mode, algo)] = complex(field.unwrap(run(staged)).reshape(()))
    for key, val in results.items():
        assert abs(val - want) < 1e-10, key


def test_random_circuit_properties():
    n, layers = random_circuit(3, 4, 8, seed=0)
    assert n == 12
    c = TensorNetworkCircuit((n, layers))
    psi = c.state_vec().reshape(-1)
    assert np.isclose(np.linalg.norm(psi), 1.0, atol=1e-10)
    # no repeated single-qubit gate on the same qubit in consecutive cycles
    seen = {}
    for layer in layers:
        for name, qubits, params in layer:
            if name == "fsim":
                continue
            q = qubits[0]
            assert seen.get(q) != name
            seen[q] = name


def test_cli_plan_and_simulate(tmp_path, capsys):
    from artensor_tpu.__main__ import main

    n, layers = random_circuit(2, 3, 4, seed=2)
    # write a qsim file for the CLI
    lines = [str(n)]
    for li, layer in enumerate(layers):
        for name, qubits, params in layer:
            lines.append(" ".join(
                [str(li), name, *map(str, qubits), *map(str, params)]))
    qsim = tmp_path / "small.qsim"
    qsim.write_text("\n".join(lines) + "\n")

    main(["info", str(qsim)])
    info = json.loads(capsys.readouterr().out)
    assert info["qubits"] == n

    plan = tmp_path / "plan.json"
    main(["plan", str(qsim), "--out", str(plan), "--sc-target", "30",
          "--trials", "1", "--iters", "3", "--serial"])
    out = json.loads(capsys.readouterr().out)
    assert out["sc"] <= 30

    main(["simulate", str(qsim), "--bitstrings", "0" * n + "," + "1" * n,
          "--serial", "--trials", "1", "--iters", "3"])
    sim_out = capsys.readouterr().out.strip().splitlines()
    got = {ln.split()[0]: complex(float(ln.split()[1]), float(ln.split()[2]))
           for ln in sim_out}
    c = TensorNetworkCircuit((n, layers))
    psi = c.state_vec().reshape(-1)
    for bs, amp in got.items():
        assert abs(amp - psi[int(bs, 2)]) < 1e-6


def test_pallas_complex_matmul_interpret():
    """Fused split-complex matmul kernel == complex matmul (interpret mode)."""
    from unittest import mock

    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import artensor_tpu.ops.pallas_mm as pm

    rng = np.random.default_rng(0)
    B, M, K, N = 2, 256, 64, 256
    a = (jnp.asarray(rng.random((B, M, K), np.float32)),
         jnp.asarray(rng.random((B, M, K), np.float32)))
    b = (jnp.asarray(rng.random((B, K, N), np.float32)),
         jnp.asarray(rng.random((B, K, N), np.float32)))
    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call",
                           lambda *args, **kw: orig(*args, interpret=True, **kw)):
        re, im = pm.complex_batched_matmul(a, b)
    want = (np.asarray(a[0]) + 1j * np.asarray(a[1])) @ \
        (np.asarray(b[0]) + 1j * np.asarray(b[1]))
    got = np.asarray(re) + 1j * np.asarray(im)
    assert np.abs(got - want).max() < 1e-3


@pytest.fixture(scope="module")
def sparse_scheme():
    from artensor_tpu.runtime.sparse import contraction_scheme_sparse

    n, layers = random_circuit(3, 3, 6, seed=13)
    c = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = c.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    rng = np.random.default_rng(5)
    bitstrings = [np.binary_repr(b, n)
                  for b in rng.choice(2 ** n, 60, replace=False)]
    order, sliced, ctree = find_order(
        tb2, ntn.bond_dims, fq2, max_bitstrings=60, sc_target=6, **PLAN_KW)
    steps, ob, bits_sorted = contraction_scheme_sparse(
        ctree, bitstrings, sc_target=6)
    axes = build_slicing_axes(tb2, sliced, batched_tensors=fq2)
    want = c.state_vec().reshape(-1)
    return ntn, steps, axes, len(sliced), bits_sorted, want


def test_segmented_matches_monolithic_sparse(sparse_scheme):
    from artensor_tpu.runtime.segmented import run_segmented, apply_sparse_step
    from artensor_tpu.runtime.sparse import execute_sparse

    ntn, steps, axes, k, bits_sorted, want = sparse_scheme
    field = make_field(np.complex128, "highest", "split")
    staged = stage_tensors(field, [ntn.tensors[i] for i in range(len(ntn.tensors))])
    mono = jax.jit(make_sliced_runner(
        execute_sparse, steps, axes, k, (len(bits_sorted),), field))(staged)
    seg = run_segmented(staged, steps, axes, k, (len(bits_sorted),), field,
                        apply_sparse_step, segment_steps=7)
    a = field.unwrap(mono).reshape(-1)
    b = field.unwrap(seg).reshape(-1)
    assert np.abs(a - b).max() < 1e-12
    for amp, bs in zip(a, bits_sorted):
        assert abs(amp - want[int(bs, 2)]) < 1e-10, bs


def test_rescaled_sparse_matches_plain(sparse_scheme):
    from artensor_tpu.runtime.rescaled import make_rescaled_runner
    from artensor_tpu.runtime.sparse import apply_sparse_step

    ntn, steps, axes, k, bits_sorted, want = sparse_scheme
    field = make_field(np.complex128, "highest", "split")
    staged = stage_tensors(field, [ntn.tensors[i] for i in range(len(ntn.tensors))])
    run = jax.jit(make_rescaled_runner(
        apply_sparse_step, steps, axes, k, (len(bits_sorted),), field))
    tensor, factor = run(staged)
    amps = field.unwrap(tensor).reshape(-1) * 10.0 ** float(factor)
    for amp, bs in zip(amps, bits_sorted):
        assert abs(amp - want[int(bs, 2)]) < 1e-8, bs


def test_checkpoint_multileg_dense_output(tmp_path):
    """Checkpointed dense contraction with a >=3-leg logical output: the
    accumulator must use the FLAT physical shape the runner produces
    (regression: a logical-shape init crashed at trace time for any
    multi-dim output, breaking the CLI --checkpoint dense path)."""
    from artensor_tpu.runtime.checkpoint import run_sliced_checkpointed

    n, layers = random_circuit(2, 2, 4, seed=3)
    c = TensorNetworkCircuit((n, layers))  # open outputs: 2^4 amplitudes
    tensors, tb, bd, fq = c.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("normal")
    order, sliced, ctree = find_order(
        tb2, ntn.bond_dims, fq2, sc_target=3, **PLAN_KW)
    assert len(sliced) >= 1
    steps, out_bonds = contraction_scheme(ctree)
    assert len(out_bonds) == n >= 3
    field = make_field(np.complex128, "highest", "split")
    staged = stage_tensors(field, [ntn.tensors[i] for i in range(len(ntn.tensors))])
    axes = build_slicing_axes(tb2, sliced)
    out_shape = (2,) * len(out_bonds)
    run = jax.jit(make_sliced_runner(
        execute_dense, steps, axes, len(sliced), out_shape, field))
    ckpt = str(tmp_path / "acc.npz")
    acc = run_sliced_checkpointed(run, staged, len(sliced), out_shape, field,
                                  ckpt, chunk=1)
    got = field.unwrap(acc).reshape(out_shape)
    # compare against the plain (non-checkpointed) run
    want = field.unwrap(run(staged)).reshape(out_shape)
    assert np.abs(got - want).max() < 1e-12


def test_linear_xeb_estimators():
    from artensor_tpu.utils.xeb import linear_xeb, xeb_against_ground_truth

    n, layers = random_circuit(3, 4, 10, seed=9)
    c = TensorNetworkCircuit((n, layers))
    psi = c.state_vec().reshape(-1)
    p = np.abs(psi) ** 2
    rng = np.random.default_rng(0)
    # bitstrings sampled from the ideal distribution -> F ~ 1
    samp = rng.choice(2 ** n, size=4000, p=p)
    f_ideal = linear_xeb(psi[samp], n, sampled=True)
    assert 0.7 < f_ideal < 1.4
    # uniformly random bitstrings -> F ~ 0
    unif = rng.integers(0, 2 ** n, size=4000)
    f_unif = linear_xeb(psi[unif], n, sampled=True)
    assert abs(f_unif) < 0.3
    # second-moment self-check on a uniform batch of a PT state ~ 1
    f2 = linear_xeb(psi[unif], n, sampled=False)
    assert 0.5 < f2 < 1.8
    stats = xeb_against_ground_truth(psi[samp], psi[samp])
    assert stats["correct_ratio"] == 1.0


def test_slicing_fidelity_one_config():
    """Keeping ONE of 2^k slice configurations yields a state of fidelity
    ~ 1/2^k against the true state (reference notebook cell 7)."""
    from artensor_tpu.runtime.executor import (
        execute_dense,
        make_sliced_runner,
        stage_tensors,
    )
    from artensor_tpu.utils.xeb import sliced_fidelity_estimate, state_fidelity
    import jax.numpy as jnp

    n, layers = random_circuit(2, 3, 8, seed=17)
    c = TensorNetworkCircuit((n, layers))
    want = c.state_vec().reshape(-1)
    tensors, tb, bd, fq = c.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("normal")
    order, sliced, ctree = find_order(
        tb2, ntn.bond_dims, fq2, sc_target=n + 1, **PLAN_KW)
    while len(ctree.tn.sliced) < 2:
        cands = ctree.slice_candidates()
        if not cands:
            break
        ctree.slicing(sorted(cands, key=str)[0])
    sliced = list(ctree.tn.sliced.keys())
    k = len(sliced)
    assert k >= 2
    steps, out_bonds = contraction_scheme(ctree)
    field = make_field(np.complex128, "highest", "split")
    staged = stage_tensors(field, [ntn.tensors[i] for i in range(len(ntn.tensors))])
    axes = build_slicing_axes(tb2, sliced)
    out_shape = (2,) * len(out_bonds)
    run = jax.jit(make_sliced_runner(execute_dense, steps, axes, k,
                                     out_shape, field))
    full = field.unwrap(run(staged)).reshape(-1)
    one_cfg = field.unwrap(
        run(staged, jnp.arange(1, dtype=jnp.int32))).reshape(-1)
    # sanity: summing all slices reproduces a normalized state (axis order
    # is the scheme's, so compare norms, not amplitudes)
    assert abs(np.linalg.norm(full) - np.linalg.norm(want)) < 1e-10
    f = state_fidelity(one_cfg, full)
    est = sliced_fidelity_estimate(k)
    assert est / 4 < f < est * 4, (f, est)


def test_auto_segmented_matches_monolithic(monkeypatch):
    """Above SEGMENT_AUTO_THRESHOLD steps, contraction() routes through the
    segmented executor; results must match the monolithic path exactly."""
    import numpy as np

    from artensor_tpu import simulation as sim_mod
    from artensor_tpu.circuits import TensorNetworkCircuit
    from artensor_tpu.circuits.random_circuits import random_circuit
    from artensor_tpu.simulation import PlannerConfig, TensorNetworkSimulation

    n, layers = random_circuit(4, 3, 8, seed=3)
    circ = TensorNetworkCircuit((n, layers))
    bits = ["0" * n, "01" * (n // 2), "1" * n]
    sim = TensorNetworkSimulation.from_circuit(circ, bits)
    sim.prepare_contraction(PlannerConfig(sc_target=24, trials=2, iters=6,
                                          parallel=False))
    mono = sim.contraction()
    monkeypatch.setattr(sim_mod, "SEGMENT_AUTO_THRESHOLD", 2)
    seg = sim.contraction()
    np.testing.assert_allclose(seg, mono, rtol=1e-5, atol=1e-7)


def test_segmented_slice_batch_and_sharded(sparse_scheme):
    """vmap slice batching inside run_segmented and the device-partitioned
    composition both reproduce the monolithic result exactly."""
    from artensor_tpu.runtime.segmented import (
        apply_sparse_step,
        run_segmented,
        run_segmented_sharded,
    )
    from artensor_tpu.runtime.sparse import execute_sparse

    ntn, steps, axes, k, bits_sorted, want = sparse_scheme
    field = make_field(np.complex128, "highest", "split")
    staged = stage_tensors(field, [ntn.tensors[i] for i in range(len(ntn.tensors))])
    mono = field.unwrap(jax.jit(make_sliced_runner(
        execute_sparse, steps, axes, k, (len(bits_sorted),), field))(staged))
    batched = run_segmented(staged, steps, axes, k, (len(bits_sorted),),
                            field, apply_sparse_step, segment_steps=9,
                            slice_batch=4)
    assert np.abs(mono - field.unwrap(batched)).max() < 1e-12
    devs = jax.devices()[:5]
    sharded = run_segmented_sharded(
        staged, steps, axes, k, (len(bits_sorted),), field,
        apply_sparse_step, devs, segment_steps=9, slice_batch=2)
    assert np.abs(mono - field.unwrap(sharded)).max() < 1e-12


def test_segmented_compile_probe_audits_xla_assignment(sparse_scheme):
    """The AOT compile probe audits XLA's OWN buffer assignment per
    segment (analytic models missed 12 GiB of n53 segment temps —
    VERDICT r4 item 5): a budget below the width-4 XLA demand raises
    SegmentAuditExceeded BEFORE any device work, and run_segmented with
    a too-small budget still lands on a working width and reproduces
    the monolithic result."""
    from artensor_tpu.runtime.executor import slice_select
    from artensor_tpu.runtime.segmented import (
        SegmentAuditExceeded, apply_sparse_step, make_segmented_executor,
        run_segmented)
    from artensor_tpu.runtime.sparse import execute_sparse

    ntn, steps, axes, k, bits_sorted, want = sparse_scheme
    field = make_field(np.complex128, "highest", "split")
    staged = stage_tensors(field,
                           [ntn.tensors[i] for i in range(len(ntn.tensors))])
    mono = field.unwrap(jax.jit(make_sliced_runner(
        execute_sparse, steps, axes, k, (len(bits_sorted),), field))(staged))
    # direct probe: XLA's assignment for any segment exceeds a 1-byte
    # budget -> rejected at compile time, nothing executed
    table = jax.eval_shape(
        lambda ts, sids: jax.vmap(lambda s: slice_select(
            ts, axes, s, k, field))(sids),
        list(staged), np.zeros(4, dtype=np.int32))
    with pytest.raises(SegmentAuditExceeded):
        make_segmented_executor(steps, apply_sparse_step, field,
                                segment_steps=9, vmapped=True,
                                input_shapes=dict(enumerate(table)),
                                hbm_budget_bytes=1)
    # end-to-end: the width search (screen + probe + halving) lands on a
    # width that runs, and the result is exact
    import artensor_tpu.planner.cost as cost
    old = cost.HBM_BUDGET_BYTES
    cost.HBM_BUDGET_BYTES = 1
    try:
        seg = run_segmented(staged, steps, axes, k, (len(bits_sorted),),
                            field, apply_sparse_step, segment_steps=9,
                            slice_batch=4)
    finally:
        cost.HBM_BUDGET_BYTES = old
    assert np.abs(mono - field.unwrap(seg)).max() < 1e-12


def test_segmented_wall_estimate(sparse_scheme):
    """segmented_wall_estimate: positive, monotone in the dispatch term
    (more segments -> larger estimate at fixed width), and its device
    component matches the monolithic per-slice model."""
    from artensor_tpu.runtime.metrics import segmented_wall_estimate

    _ntn, steps, _axes, _k, _bits, _want = sparse_scheme
    t64, dev, n64 = segmented_wall_estimate(steps, n_slices=8, width=2,
                                            segment_steps=64)
    t4, dev4, n4 = segmented_wall_estimate(steps, n_slices=8, width=2,
                                           segment_steps=4)
    assert t64 > 0 and dev > 0 and n4 > n64 >= 1
    assert dev4 == dev
    assert t4 > t64            # dispatch term scales with segment count


def test_torch_baseline_executor_matches(sparse_scheme):
    """The torch-CPU baseline harness (scripts/torch_baseline.py — the
    reference execution model used for vs_baseline) reproduces the oracle
    amplitudes on the full slice loop."""
    import importlib.util
    import os

    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "torch_baseline", os.path.join(os.path.dirname(__file__), "..",
                                       "scripts", "torch_baseline.py"))
    tbl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tbl)

    ntn, steps, axes, k, bits_sorted, want = sparse_scheme
    host = [np.asarray(ntn.tensors[i], dtype=np.complex128)
            for i in range(len(ntn.tensors))]
    acc = None
    for sid in range(2 ** k):
        sl = tbl.np_slice_select(host, axes, sid, k)
        bufs = {i: torch.from_numpy(np.ascontiguousarray(t))
                for i, t in enumerate(sl)}
        out = tbl.torch_execute_sparse(torch, bufs, steps).numpy()
        acc = out if acc is None else acc + out
    amps = acc.reshape(-1)
    for amp, bs in zip(amps, bits_sorted):
        assert abs(amp - want[int(bs, 2)]) < 1e-10, bs


def test_segmented_width_audit(sparse_scheme):
    """The temp-aware HBM audit clamps an oversized segmented slice-batch
    (the n53 batch-4 OOM class) to a safe power of two — and the clamped
    run still reproduces the monolithic result."""
    from artensor_tpu.runtime.metrics import (
        max_safe_slice_batch, scheme_peak_live_bytes)
    from artensor_tpu.runtime.segmented import (
        apply_sparse_step, run_segmented)
    from artensor_tpu.runtime.sparse import execute_sparse

    ntn, steps, axes, k, bits_sorted, want = sparse_scheme
    peak = scheme_peak_live_bytes(steps)
    # a budget of 2 peaks allows exactly width 2
    assert max_safe_slice_batch(steps, 64, hbm_budget_bytes=2 * peak) == 2
    assert max_safe_slice_batch(steps, 1, hbm_budget_bytes=2 * peak) == 1
    # never below 1 even when a single slice exceeds the budget
    assert max_safe_slice_batch(steps, 8, hbm_budget_bytes=peak / 2) == 1
    field = make_field(np.complex128, "highest", "split")
    staged = stage_tensors(field,
                           [ntn.tensors[i] for i in range(len(ntn.tensors))])
    mono = field.unwrap(jax.jit(make_sliced_runner(
        execute_sparse, steps, axes, k, (len(bits_sorted),), field))(staged))
    import artensor_tpu.planner.cost as cost
    old = cost.HBM_BUDGET_BYTES
    cost.HBM_BUDGET_BYTES = 2 * peak     # audit clamps 8 -> 2
    try:
        seg = run_segmented(staged, steps, axes, k, (len(bits_sorted),),
                            field, apply_sparse_step, segment_steps=9,
                            slice_batch=8)
    finally:
        cost.HBM_BUDGET_BYTES = old
    assert np.abs(mono - field.unwrap(seg)).max() < 1e-12


def test_scheme_wall_estimate_and_peak(sparse_scheme):
    """scheme_peak_live_bytes >= the largest single buffer; the wall
    estimate is positive, finite, and its width respects the HBM budget
    (width halves when the budget does)."""
    from artensor_tpu.runtime.lowering import _prod
    from artensor_tpu.runtime.metrics import (
        scheme_peak_live_bytes, scheme_wall_estimate)

    _, steps, _, k, _, _ = sparse_scheme
    peak = scheme_peak_live_bytes(steps)
    biggest = 0
    for s in steps:
        lows = [s.lowered] if getattr(s, "lowered", None) is not None \
            else list(getattr(s, "lowered_chunks", ()) or ())
        for low in lows:
            biggest = max(biggest, _prod(low.phys_y))
    assert peak >= biggest * 4.0 * 2
    secs, width, p = scheme_wall_estimate(steps, k)
    assert np.isfinite(secs) and secs > 0 and p == peak
    assert width >= 1 and width & (width - 1) == 0     # power of two
    secs2, width2, _ = scheme_wall_estimate(
        steps, k, hbm_budget_bytes=max(int(peak), 1))
    assert width2 <= width and secs2 >= secs


def test_wall_estimate_calibration(sparse_scheme, tmp_path, monkeypatch):
    """Identity calibration reproduces the uncalibrated estimate exactly;
    a calibration file rescales each component as documented."""
    from artensor_tpu.planner.cost import (STEP_OVERHEAD_W1_S,
                                           TPU_HBM_BYTES_PER_S)
    from artensor_tpu.runtime import metrics as mt

    _, steps, _, k, _, _ = sparse_scheme
    mt.load_calibration(refresh=True)       # whatever the repo ships
    base, w, _ = mt.scheme_wall_estimate(steps, k)
    kern, xla, byts, n = mt.scheme_wall_components(steps)
    cal0 = mt.load_calibration()
    expect = 2 ** k * (cal0["kern_factor"] * kern
                       + cal0["xla_factor"] * xla
                       + cal0["byte_factor"] * byts / TPU_HBM_BYTES_PER_S
                       + n * (cal0["step_overhead_w1_s"]
                              or STEP_OVERHEAD_W1_S) / w)
    assert base == pytest.approx(expect, rel=1e-9)
    p = tmp_path / "cal.json"
    p.write_text(json.dumps({"kern_factor": 2.0, "xla_factor": 1.5,
                             "byte_factor": 3.0,
                             "step_overhead_w1_s": 1e-3}))
    monkeypatch.setenv("ARTENSOR_TPU_CALIBRATION", str(p))
    try:
        mt.load_calibration(refresh=True)
        got, w2, _ = mt.scheme_wall_estimate(steps, k)
        assert w2 == w              # width depends on peak only
        expect2 = 2 ** k * (2.0 * kern + 1.5 * xla
                            + 3.0 * byts / TPU_HBM_BYTES_PER_S
                            + n * 1e-3 / w)
        assert got == pytest.approx(expect2, rel=1e-9)
        assert got > base
    finally:
        monkeypatch.delenv("ARTENSOR_TPU_CALIBRATION")
        mt.load_calibration(refresh=True)


def test_fit_calibration_recovers_planted_factors(tmp_path):
    """scripts/fit_calibration.py recovers factors that generated
    synthetic width-sweep records (two schemes, exact model)."""
    import subprocess
    import sys as _sys

    from artensor_tpu.planner.cost import TPU_HBM_BYTES_PER_S

    root = os.path.join(os.path.dirname(__file__), "..")
    # kern/xla are FIXED at 1.0 in the physical fit (round 4): only the
    # byte factor and per-step overhead are free
    planted = dict(kern=1.0, xla=1.0, byte=0.8, oh=4e-4)
    recs = [
        {"plan": "a", "k": 8, "kern_s": 3e-3, "xla_s": 4e-4,
         "bytes_per_slice": 1.7e9, "n_steps": 180},
        {"plan": "b", "k": 4, "kern_s": 2.0e-2, "xla_s": 3e-3,
         "bytes_per_slice": 1.3e10, "n_steps": 160},
        {"plan": "c", "k": 6, "kern_s": 9e-3, "xla_s": 1e-3,
         "bytes_per_slice": 2.5e9, "n_steps": 200},
    ]
    paths = []
    for r in recs:
        pts = []
        for w in (32, 64, 128):
            wall = 2 ** r["k"] * (
                planted["kern"] * r["kern_s"]
                + planted["xla"] * r["xla_s"]
                + planted["byte"] * r["bytes_per_slice"]
                / TPU_HBM_BYTES_PER_S
                + r["n_steps"] * planted["oh"] / w)
            pts.append({"width": w, "wall_s": wall})
        r["points"] = pts
        p = tmp_path / f"{r['plan']}.json"
        p.write_text(json.dumps(r))
        paths.append(str(p))
    out = subprocess.run(
        [_sys.executable, os.path.join(root, "scripts",
                                       "fit_calibration.py")] + paths,
        capture_output=True, text=True, check=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    cal = json.loads(out.stdout[:out.stdout.index("}") + 1])
    assert cal["kern_factor"] == pytest.approx(planted["kern"], abs=2e-3)
    assert cal["xla_factor"] == pytest.approx(planted["xla"], abs=2e-3)
    assert cal["byte_factor"] == pytest.approx(planted["byte"], abs=2e-3)
    assert cal["step_overhead_w1_s"] == pytest.approx(planted["oh"],
                                                      rel=1e-2)



def _fake_step(i, j, kernel_est=None, xla_elems=None):
    """Minimal step object for negotiate()/scheme_wall_estimate tests."""
    from types import SimpleNamespace

    lane = SimpleNamespace(est_s=kernel_est) if kernel_est else None
    lowered = None
    if xla_elems:
        K, M, N = xla_elems
        lowered = SimpleNamespace(
            dnums=(((0,), (0,)), ((), ())), shape_l=(K, M), shape_r=(K, N),
            phys_y=(M, N), re_out=None, swapped=False)
    return SimpleNamespace(i=i, j=j, lane=lane, lowered=lowered,
                           lowered_chunks=None, gathers=None,
                           post_select=None)


def test_negotiate_kernel_unlocking_chain():
    """A candidate that unlocks a kernel on a hot XLA step but REGRESSES
    the estimate at hop 1 (its consumer falls to a pre-permuted form) is
    still found when following the consumer's own request resolves the
    chain to a strict net win (negotiate phase 2)."""
    from artensor_tpu.runtime.negotiate import negotiate

    BIG = (128, 2048, 2048)        # hot both-big XLA shape

    def compile_fn(ov):
        ov = ov or {}
        steps = [_fake_step(0, 1, kernel_est=1e-4)]
        if ov.get(1) == "grouped":
            steps.append(_fake_step(0, 2, kernel_est=2e-4))
            if ov.get(2) == "friendly":
                # consumer re-kernels in place: strict win overall
                steps.append(_fake_step(0, 3, kernel_est=1e-4))
                requests = {}
            else:
                # consumer pays a pre-permuted form: hop-1 regression
                steps.append(_fake_step(0, 3, kernel_est=2.7e-4))
                requests = {2: ("friendly",)}
        else:
            steps.append(_fake_step(0, 2, xla_elems=BIG))
            steps.append(_fake_step(0, 3, kernel_est=1e-4))
            requests = {1: ("grouped",)}
        return tuple(sorted(ov.items())), steps, requests

    assert negotiate(compile_fn) == ((1, "grouped"), (2, "friendly"))


def test_negotiate_never_trades_away_kernels():
    """The hard guard: no pass-1 kernel may be lost, even when the trial
    models faster."""
    from artensor_tpu.runtime.negotiate import negotiate

    def compile_fn(ov):
        ov = ov or {}
        if ov.get(1) == "fast":
            # models 10x faster but DROPS step 2's pass-1 kernel
            steps = [_fake_step(0, 1, kernel_est=1e-5),
                     _fake_step(0, 2, xla_elems=(8, 128, 128)),
                     _fake_step(0, 3, kernel_est=1e-5)]
            return "bad", steps, {}
        steps = [_fake_step(0, 1, kernel_est=1e-4),
                 _fake_step(0, 2, kernel_est=1e-4),
                 _fake_step(0, 3, kernel_est=1e-4)]
        return "pass1", steps, {1: ("fast",)}

    assert negotiate(compile_fn) == "pass1"


def test_lane_max_steps_threads_through():
    from artensor_tpu.circuits import TensorNetworkCircuit
    from artensor_tpu.circuits.random_circuits import random_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.planner import find_order
    from artensor_tpu.runtime.sparse import contraction_scheme_sparse

    n, layers = random_circuit(3, 3, 6, seed=13)
    c = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = c.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    rng = np.random.default_rng(5)
    bitstrings = [np.binary_repr(b, n)
                  for b in rng.choice(2 ** n, 40, replace=False)]
    order, sliced, ctree = find_order(
        tb2, ntn.bond_dims, fq2, max_bitstrings=40, sc_target=6, **PLAN_KW)
    low, _, _ = contraction_scheme_sparse(
        ctree, bitstrings, sc_target=6, lane_max_steps=1)
    off, _, _ = contraction_scheme_sparse(
        ctree, bitstrings, sc_target=6, lane_schedule=False)
    assert [s.iy for s in low] == [s.iy for s in off]
    hi, _, _ = contraction_scheme_sparse(
        ctree, bitstrings, sc_target=6, lane_max_steps=10000)
    dflt, _, _ = contraction_scheme_sparse(ctree, bitstrings, sc_target=6)
    assert [s.iy for s in hi] == [s.iy for s in dflt]


def test_negotiate_merges_independent_wins():
    """Phase 0: independently-winning single moves on disjoint steps are
    accumulated even with no best-first budget (the dense block scheme
    carries 8+ such pre-transpose removals)."""
    from artensor_tpu.runtime.negotiate import negotiate

    def compile_fn(ov):
        ov = ov or {}
        steps = []
        for t in (1, 2, 3):
            # each override independently halves its step's kernel est
            est = 1e-4 if ov.get(t) == "better" else 2e-4
            steps.append(_fake_step(0, t, kernel_est=est))
        requests = {t: ("better",) for t in (1, 2, 3) if t not in ov}
        return tuple(sorted(ov.items())), steps, requests

    got = negotiate(compile_fn, max_trials=0, chain_budget=0)
    assert got == ((1, "better"), (2, "better"), (3, "better"))


def test_sparse_memo_reuse_is_exact():
    """The cross-trial batch-metadata memo must not change compiled
    schemes: compiling trial 2 with trial 1's memo gives byte-identical
    step metadata to a fresh compile."""
    from artensor_tpu.circuits import TensorNetworkCircuit
    from artensor_tpu.circuits.random_circuits import random_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.planner import find_order
    from artensor_tpu.runtime.sparse import _compile_sparse

    n, layers = random_circuit(3, 3, 6, seed=13)
    c = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = c.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    rng = np.random.default_rng(5)
    bitstrings = [np.binary_repr(b, n)
                  for b in rng.choice(2 ** n, 40, replace=False)]
    order, sliced, ctree = find_order(
        tb2, ntn.bond_dims, fq2, max_bitstrings=40, sc_target=6, **PLAN_KW)
    memo = {}
    s1, _, _, req = _compile_sparse(ctree, bitstrings, 6, True, None,
                                    _memo=memo)
    assert memo  # at least one both-batched merge memoized
    ov = {t: cands[0] for t, cands in list(req.items())[:1]} or None
    s2_memo, _, _, _ = _compile_sparse(ctree, bitstrings, 6, True, ov,
                                       _memo=memo)
    s2_fresh, _, _, _ = _compile_sparse(ctree, bitstrings, 6, True, ov)
    assert len(s2_memo) == len(s2_fresh)
    for a, b in zip(s2_memo, s2_fresh):
        assert a.iy == b.iy and a.ix_i == b.ix_i and a.ix_j == b.ix_j
        assert (a.post_select is None) == (b.post_select is None)
        if a.post_select is not None:
            assert np.array_equal(a.post_select, b.post_select)
        assert (a.gathers is None) == (b.gathers is None)
        if a.gathers is not None:
            for (ga, gb), (ha, hb) in zip(a.gathers, b.gathers):
                assert np.array_equal(ga, ha) and np.array_equal(gb, hb)
        assert a.reshape == b.reshape


def test_precompute_static_steps(sparse_scheme):
    """Host folding of slice-independent steps: the reduced program
    produces the same amplitudes, sliced/batched steps never fold, and
    the final step always stays on device."""
    from artensor_tpu.runtime.executor import precompute_static_steps
    from artensor_tpu.runtime.sparse import execute_sparse

    ntn, steps, axes, k, bits_sorted, want = sparse_scheme
    arrays0 = [ntn.tensors[i] for i in range(len(ntn.tensors))]
    run_steps, arrays = precompute_static_steps(steps, arrays0, axes)
    assert run_steps, "final step must remain"
    assert run_steps[-1] is steps[-1]
    assert len(run_steps) < len(steps)   # something folded
    field = make_field(np.complex128, "highest", "split")
    staged = stage_tensors(field, arrays)
    run = jax.jit(make_sliced_runner(
        execute_sparse, run_steps, axes, k, (len(bits_sorted),), field))
    got = field.unwrap(run(staged))
    for amp, bs in zip(np.asarray(got), bits_sorted):
        assert abs(amp - want[int(bs, 2)]) < 2e-6, bs


def test_scheme_cache_roundtrip(tmp_path, monkeypatch):
    """The pickled scheme reproduces the fresh compile exactly and a
    compiler-source edit would change the key (hash covers the code)."""
    from artensor_tpu.circuits import TensorNetworkCircuit
    from artensor_tpu.circuits.random_circuits import random_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.planner import find_order
    from artensor_tpu.runtime import scheme_cache as scc

    monkeypatch.setenv("ARTENSOR_TPU_SCHEME_CACHE", str(tmp_path / "sc"))
    n, layers = random_circuit(3, 3, 6, seed=13)
    c = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = c.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    tb2, fq2 = ntn.simplify("sparse")
    rng = np.random.default_rng(5)
    bits = [np.binary_repr(b, n) for b in rng.choice(2 ** n, 30,
                                                     replace=False)]
    order, sliced, ctree = find_order(
        tb2, ntn.bond_dims, fq2, max_bitstrings=30, sc_target=6, **PLAN_KW)
    plan_path = tmp_path / "p.json"
    plan_io.save_plan(plan_path, ctree)
    s1, ob1, bs1 = scc.cached_scheme_sparse(plan_path, ctree, bits, 6)
    assert len(os.listdir(tmp_path / "sc")) == 1
    s2, ob2, bs2 = scc.cached_scheme_sparse(plan_path, ctree, bits, 6)
    assert ob1 == ob2 and bs1 == bs2 and len(s1) == len(s2)
    for a, b in zip(s1, s2):
        assert a.iy == b.iy and (a.i, a.j) == (b.i, b.j)
        assert (a.lane is None) == (b.lane is None)
    # different bitstrings -> different key, no false hit
    bits3 = bits[:20]
    s3, _, bs3 = scc.cached_scheme_sparse(plan_path, ctree, bits3, 6)
    assert len(os.listdir(tmp_path / "sc")) == 2
    assert len(bs3) == len(set(bits3))


def test_is_device_oom_classification():
    """The segmented OOM retry must only trigger on genuine memory
    exhaustion, not on any error whose text mentions 'memory' (round-4
    advisor finding)."""
    from jax.errors import JaxRuntimeError

    from artensor_tpu.runtime.segmented import _is_device_oom

    assert _is_device_oom(JaxRuntimeError(
        "RESOURCE_EXHAUSTED: Out of memory allocating 16G"))
    assert _is_device_oom(RuntimeError(
        "remote compile failed: used 20.25G of 15.75G hbm"))
    # unrelated errors that merely mention memory-ish words must re-raise
    assert not _is_device_oom(ValueError(
        "operand memory layout does not match the expected tiling"))
    assert not _is_device_oom(TypeError("resource handle is not hashable"))
