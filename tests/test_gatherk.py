"""Gather-K kernel unit tests: plan invariants + kernel vs einsum oracle.

Shapes are kept small (grid <= 8, H*K <= 32) because interpret-mode Pallas
compiles slowly; every structural feature still goes through the kernel:
scattered contract legs, merged g runs, pinned batch legs, H placement,
the H == 1 degenerate form, and the MXU contiguous-K path.
"""

import os

import numpy as np
import pytest

from artensor_tpu.ops.field import make_field
from artensor_tpu.runtime import gatherk as gk
from artensor_tpu.runtime.gatherk import (
    apply_gk_step,
    gk_output_order,
    plan_gk_step,
)


def _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(dims_x) + 1j * rng.standard_normal(dims_x)) \
        .astype(np.complex64)
    w = (rng.standard_normal(dims_w) + 1j * rng.standard_normal(dims_w)) \
        .astype(np.complex64)
    lab = {l: k for k, l in enumerate({*ix_x, *ix_w, *iy})}
    want = np.einsum(x, [lab[l] for l in ix_x], w, [lab[l] for l in ix_w],
                     [lab[l] for l in iy])
    field = make_field(np.complex64, "highest", "split")
    xs = field.wrap(x.reshape(-1))
    ws = field.wrap(w.reshape(-1))
    got = apply_gk_step(field, xs, ws, plan, interpret=True)
    dim_of = dict(zip(ix_x, dims_x))
    dim_of.update(zip(ix_w, dims_w))
    got = field.unwrap(got).reshape([dim_of[l] for l in iy])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def _plan(ix_x, ix_w, iy, dims_x, dims_w, pin=0, min_x=1):
    old, olds = gk.MIN_X_ELEMS, gk.SLACK
    gk.MIN_X_ELEMS, gk.SLACK = min_x, 1e9   # test shapes are tiny: bypass
    try:                                    # the est-vs-XLA economics gate
        return plan_gk_step(ix_x, ix_w, iy, dims_x, dims_w, pin=pin)
    finally:
        gk.MIN_X_ELEMS, gk.SLACK = old, olds


def test_scattered_contract_legs():
    ix_x = ("g1", "c1", "g2", "c2", "f1")
    dims_x = (2, 2, 4, 2, 256)
    ix_w = ("c1", "c2", "n1")
    dims_w = (2, 2, 2)
    iy = ("g1", "g2", "n1", "f1")
    plan = _plan(ix_x, ix_w, iy, dims_x, dims_w)
    assert plan is not None and not plan.use_mxu
    assert plan.K == 4 and plan.H == 2
    assert len(plan.c_dims) == 2      # scattered: two c view axes
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_merged_g_runs_and_h_position():
    # adjacent g legs merge into ONE grid dim when iy keeps them adjacent
    ix_x = ("g1", "g2", "c1", "f1")
    dims_x = (2, 2, 4, 512)
    ix_w = ("c1", "n1", "n2")
    dims_w = (4, 2, 2)
    iy = ("g1", "g2", "n1", "n2", "f1")
    plan = _plan(ix_x, ix_w, iy, dims_x, dims_w)
    assert plan is not None
    assert sum(1 for a in plan.x_axes if a[0] == "g") == 1
    assert plan.H == 4
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_pinned_batch_leg():
    # a leading batch axis stays the leading output axis (sparse pass-step)
    ix_x = ("b", "c1", "g1", "f1")
    dims_x = (3, 2, 2, 256)
    ix_w = ("c1", "n1")
    dims_w = (2, 2)
    iy = ("b", "g1", "n1", "f1")
    plan = _plan(ix_x, ix_w, iy, dims_x, dims_w, pin=1)
    assert plan is not None
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_h_equals_one():
    # W fully contracted: no H axis in the output view
    ix_x = ("g1", "c1", "f1")
    dims_x = (4, 4, 256)
    ix_w = ("c1",)
    dims_w = (4,)
    iy = ("g1", "f1")
    plan = _plan(ix_x, ix_w, iy, dims_x, dims_w)
    assert plan is not None and plan.H == 1
    assert not any(a[0] == "H" for a in plan.y_axes)
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_mxu_contiguous_k():
    # one contiguous contract run + large K*H -> MXU per-column dots
    ix_x = ("c1", "c2", "c3", "c4", "c5", "c6", "f1")
    dims_x = (2, 2, 2, 2, 2, 2, 256)
    ix_w = ("c1", "c2", "c3", "c4", "c5", "c6", "n1")
    dims_w = (2, 2, 2, 2, 2, 2, 32)
    iy = ("n1", "f1")
    plan = _plan(ix_x, ix_w, iy, dims_x, dims_w)
    assert plan is not None and plan.use_mxu
    assert plan.K == 64 and plan.H == 32
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_w_on_the_left():
    # operand order must not matter: W passed as ix_i
    ix_w = ("c1", "n1")
    dims_w = (2, 2)
    ix_x = ("g1", "c1", "f1")
    dims_x = (4, 2, 256)
    iy = ("g1", "n1", "f1")
    plan = _plan(ix_w, ix_x, iy, dims_w, dims_x)
    assert plan is not None and not plan.w_is_j
    rng = np.random.default_rng(3)
    w = (rng.standard_normal(dims_w) + 1j * rng.standard_normal(dims_w)) \
        .astype(np.complex64)
    x = (rng.standard_normal(dims_x) + 1j * rng.standard_normal(dims_x)) \
        .astype(np.complex64)
    want = np.einsum("cn,gcf->gnf", w, x)
    field = make_field(np.complex64, "highest", "split")
    got = apply_gk_step(field, field.wrap(w.reshape(-1)),
                        field.wrap(x.reshape(-1)), plan, interpret=True)
    got = field.unwrap(got).reshape(4, 2, 256)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_rejections():
    # shared batch label (aligned-gather form) is out of scope
    assert _plan(("b", "c1", "f1"), ("b", "c1", "n1"),
                 ("b", "n1", "f1"), (4, 2, 256), (4, 2, 2)) is None
    assert gk.LAST_REJECT == "shared-batch"
    # no trailing free run
    assert _plan(("f1", "c1"), ("c1", "n1"),
                 ("n1", "f1"), (256, 2), (2, 2)) is None
    # f run far too small for any lane split (< 32)
    assert _plan(("g1", "c1", "f1"), ("c1", "n1"),
                 ("g1", "n1", "f1"), (64, 2, 16), (2, 2)) is None
    # H legs split in iy
    assert _plan(("g1", "c1", "f1"), ("c1", "n1", "n2"),
                 ("n1", "g1", "n2", "f1"), (4, 2, 256), (2, 2, 2)) is None
    assert gk.LAST_REJECT == "h-contig"


def test_gk_output_order_roundtrip():
    ix_x = ("g1", "c1", "g2", "c2", "f1")
    dims_x = (2, 2, 4, 2, 256)
    ix_w = ("c1", "c2", "n1")
    dims_w = (2, 2, 2)
    iy = gk_output_order(ix_x, ix_w, {"g1", "g2", "n1", "f1"},
                         dims_x, dims_w)
    assert iy == ("g1", "g2", "n1", "f1")
    plan = _plan(ix_x, ix_w, iy, dims_x, dims_w)
    assert plan is not None
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_gk_output_order_pinned():
    iy = gk_output_order(("b", "c1", "g1", "f1"), ("c1", "n1"),
                         {"b", "g1", "n1", "f1"}, (5, 2, 2, 128), (2, 2),
                         pin=1)
    assert iy[0] == "b"
    assert iy.index("n1") < iy.index("f1")


def test_batched_block_diagonal_rule():
    """jax.vmap over apply_gk_step takes the custom batching rule: qb
    slice instances packed block-diagonally into one MXU dot.  Checked
    against the vmapped einsum oracle for batched-X/unbatched-W and
    batched-both, at widths that exercise qb > 1."""
    import jax

    ix_x = ("c1", "c2", "c3", "c4", "g1", "f1")
    dims_x = (2, 2, 2, 2, 2, 512)     # K = 16 -> qb = 4
    ix_w = ("c1", "c2", "c3", "c4", "n1", "n2")
    dims_w = (2, 2, 2, 2, 4, 4)
    iy = ("g1", "n1", "n2", "f1")
    plan = _plan(ix_x, ix_w, iy, dims_x, dims_w)
    assert plan is not None and plan.use_mxu and plan.qb >= 4

    W = 8
    rng = np.random.default_rng(7)
    xs = (rng.standard_normal((W,) + dims_x)
          + 1j * rng.standard_normal((W,) + dims_x)).astype(np.complex64)
    w1 = (rng.standard_normal(dims_w)
          + 1j * rng.standard_normal(dims_w)).astype(np.complex64)
    ws = (rng.standard_normal((W,) + dims_w)
          + 1j * rng.standard_normal((W,) + dims_w)).astype(np.complex64)
    field = make_field(np.complex64, "highest", "split")

    lab = {l: k for k, l in enumerate({*ix_x, *ix_w, *iy})}
    ex = [lab[l] for l in ix_x]
    ew = [lab[l] for l in ix_w]
    ey = [lab[l] for l in iy]

    def one(xf, wf):
        return apply_gk_step(field, xf, wf, plan, interpret=True)

    # batched X, shared W
    xb = (jnp_stack(xs.real), jnp_stack(xs.imag))
    wu = field.wrap(w1.reshape(-1))
    got = jax.vmap(one, in_axes=((0, 0), None))(xb, wu)
    want = np.stack([np.einsum(xs[b], ex, w1, ew, ey) for b in range(W)])
    out = (np.asarray(got[0]) + 1j * np.asarray(got[1])).reshape(want.shape)
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=1e-5)

    # batched X AND batched W
    wb = (jnp_stack(ws.real), jnp_stack(ws.imag))
    got2 = jax.vmap(one, in_axes=((0, 0), (0, 0)))(xb, wb)
    want2 = np.stack([np.einsum(xs[b], ex, ws[b], ew, ey) for b in range(W)])
    out2 = (np.asarray(got2[0]) + 1j * np.asarray(got2[1])).reshape(want2.shape)
    np.testing.assert_allclose(out2, want2, rtol=2e-4, atol=1e-5)


def jnp_stack(a):
    import jax.numpy as jnp
    W = a.shape[0]
    return jnp.asarray(a.reshape(W, -1).astype(np.float32))


def test_short_tail_fm64():
    # a 64-element trailing run plans at lane width fm=64 (half-lane)
    ix_x = ("g1", "c1", "f1")
    dims_x = (64, 2, 64)
    ix_w = ("c1", "n1")
    dims_w = (2, 2)
    iy = ("g1", "n1", "f1")
    plan = _plan(ix_x, ix_w, iy, dims_x, dims_w)
    assert plan is not None and plan.fm == 64
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_grid_blocking_short_f():
    """Short trailing runs block a grid axis by gt so each program covers
    many (K, F) sub-problems (short-F plans were measured overhead-bound
    under vmap).  Oracle-checked unbatched and under vmap."""
    import jax

    ix_x = ("g1", "c1", "c2", "f1")
    dims_x = (64, 2, 2, 128)
    ix_w = ("c1", "c2", "n1")
    dims_w = (2, 2, 4)
    iy = ("g1", "n1", "f1")
    plan = _plan(ix_x, ix_w, iy, dims_x, dims_w)
    assert plan is not None and plan.gt > 1 and plan.gb_gid is not None
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)

    if plan.use_mxu and plan.qb > 1:
        W = 4
        rng = np.random.default_rng(11)
        xs = (rng.standard_normal((W,) + dims_x)
              + 1j * rng.standard_normal((W,) + dims_x)).astype(np.complex64)
        w1 = (rng.standard_normal(dims_w)
              + 1j * rng.standard_normal(dims_w)).astype(np.complex64)
        field = make_field(np.complex64, "highest", "split")
        xb = (jnp_stack(xs.real), jnp_stack(xs.imag))
        wu = field.wrap(w1.reshape(-1))
        got = jax.vmap(lambda xf, wf: apply_gk_step(
            field, xf, wf, plan, interpret=True),
            in_axes=((0, 0), None))(xb, wu)
        lab = {l: k for k, l in enumerate({*ix_x, *ix_w, *iy})}
        want = np.stack([np.einsum(xs[b], [lab[l] for l in ix_x],
                                   w1, [lab[l] for l in ix_w],
                                   [lab[l] for l in iy])
                         for b in range(W)])
        out = (np.asarray(got[0]) + 1j * np.asarray(got[1])).reshape(
            want.shape)
        np.testing.assert_allclose(out, want, rtol=2e-4, atol=1e-5)


def test_pre_permuted_no_f_run():
    """A stored X order with contract legs in the minor run ('no-f-run')
    is rejected in place but accepted by plan_gk_step_pre: one cheap
    run-collapsed transpose of X into an iy-derived GK order, iy itself
    unchanged.  Oracle vs einsum on the STORED order."""
    from artensor_tpu.runtime.gatherk import plan_gk_step_pre

    ix_x = ("g1", "f1", "c1", "c2")     # contract legs trail: minor run
    dims_x = (4, 256, 2, 2)
    ix_w = ("c1", "c2", "n1")
    dims_w = (2, 2, 2)
    iy = ("g1", "n1", "f1")             # trailing X-free suffix f1 = 256

    assert _plan(ix_x, ix_w, iy, dims_x, dims_w) is None  # in-place: no

    old, olds = gk.MIN_X_ELEMS, gk.SLACK
    gk.MIN_X_ELEMS, gk.SLACK = 1, 1e9
    try:
        plan = plan_gk_step_pre(ix_x, ix_w, iy, dims_x, dims_w)
    finally:
        gk.MIN_X_ELEMS, gk.SLACK = old, olds
    assert plan is not None and plan.pre is not None
    assert plan.pre.mode == "transpose"
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_pre_permuted_w_side():
    """plan_gk_step_pre picks the bigger operand as X regardless of
    argument side; multi-leg iy tail runs fold into the f run."""
    from artensor_tpu.runtime.gatherk import plan_gk_step_pre

    # X arrives as the SECOND operand; tail run (f2, f1) = (3, 128).
    ix_w = ("c1", "n1")
    dims_w = (4, 2)
    ix_x = ("g1", "f1", "c1", "f2")
    dims_x = (8, 128, 4, 3)
    iy = ("g1", "n1", "f2", "f1")

    old, olds = gk.MIN_X_ELEMS, gk.SLACK
    gk.MIN_X_ELEMS, gk.SLACK = 1, 1e9
    try:
        plan = plan_gk_step_pre(ix_w, ix_x, iy, dims_w, dims_x)
    finally:
        gk.MIN_X_ELEMS, gk.SLACK = old, olds
    assert plan is not None and plan.pre is not None
    _run_and_check(ix_w, ix_x, iy, dims_w, dims_x, plan)


def test_batched_rule_qb1_keeps_per_instance_windows():
    """K >= 64 plans have qb == 1; under vmap they must STILL route
    through the batched kernel (batch = leading grid axis, per-instance
    VMEM windows) — the naive-vmap fallback folds the whole batch into
    the window and aborted compile at 161MB scoped VMEM on the sc25
    plan.  Oracle-checked at width 8."""
    import jax

    ix_x = tuple(f"c{k}" for k in range(6)) + ("g1", "f1")
    dims_x = (2, 2, 2, 2, 2, 2, 2, 512)      # K = 64 -> qb = 1
    ix_w = tuple(f"c{k}" for k in range(6)) + ("n1",)
    dims_w = (2, 2, 2, 2, 2, 2, 4)
    iy = ("g1", "n1", "f1")
    plan = _plan(ix_x, ix_w, iy, dims_x, dims_w)
    assert plan is not None and plan.use_mxu and plan.qb == 1

    W = 8
    rng = np.random.default_rng(11)
    xs = (rng.standard_normal((W,) + dims_x)
          + 1j * rng.standard_normal((W,) + dims_x)).astype(np.complex64)
    w1 = (rng.standard_normal(dims_w)
          + 1j * rng.standard_normal(dims_w)).astype(np.complex64)
    field = make_field(np.complex64, "highest", "split")

    lab = {l: k for k, l in enumerate({*ix_x, *ix_w, *iy})}
    ex = [lab[l] for l in ix_x]
    ew = [lab[l] for l in ix_w]
    ey = [lab[l] for l in iy]

    def one(xf, wf):
        return apply_gk_step(field, xf, wf, plan, interpret=True)

    xb = (jnp_stack(xs.real), jnp_stack(xs.imag))
    wu = field.wrap(w1.reshape(-1))
    got = jax.vmap(one, in_axes=((0, 0), None))(xb, wu)
    want = np.stack([np.einsum(xs[b], ex, w1, ew, ey) for b in range(W)])
    out = (np.asarray(got[0]) + 1j * np.asarray(got[1])).reshape(want.shape)
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=1e-5)


def test_vpu_plan_vmap_via_sequential_map():
    """use_mxu=False (VPU-path) plans under vmap must not fold the batch
    into the VMEM window; they run as a sequential lax.map.  Oracle-
    checked batched-X/shared-W and batched-both."""
    import jax

    # tiny K=2, H=1 with a non-128 tail: plans off the MXU path
    ix_x = ("c1", "g1", "f1")
    dims_x = (2, 2, 4096)
    ix_w = ("c1", "n1")
    dims_w = (2, 2)
    iy = ("g1", "n1", "f1")
    plan = _plan(ix_x, ix_w, iy, dims_x, dims_w)
    if plan is None or plan.use_mxu:
        import pytest
        pytest.skip("planner put this form on the MXU path")

    W = 4
    rng = np.random.default_rng(13)
    xs = (rng.standard_normal((W,) + dims_x)
          + 1j * rng.standard_normal((W,) + dims_x)).astype(np.complex64)
    w1 = (rng.standard_normal(dims_w)
          + 1j * rng.standard_normal(dims_w)).astype(np.complex64)
    field = make_field(np.complex64, "highest", "split")
    lab = {l: k for k, l in enumerate({*ix_x, *ix_w, *iy})}
    ex, ew, ey = ([lab[l] for l in ix] for ix in (ix_x, ix_w, iy))

    def one(xf, wf):
        return apply_gk_step(field, xf, wf, plan, interpret=True)

    xb = (jnp_stack(xs.real), jnp_stack(xs.imag))
    got = jax.vmap(one, in_axes=((0, 0), None))(xb, field.wrap(w1.reshape(-1)))
    want = np.stack([np.einsum(xs[b], ex, w1, ew, ey) for b in range(W)])
    out = (np.asarray(got[0]) + 1j * np.asarray(got[1])).reshape(want.shape)
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=1e-5)


def test_all_repo_plan_schemes_fit_vmem_budget():
    """Every GK plan the compilers attach, across every bundled n30 plan
    file, must keep its padded double-buffered windows within the scoped
    VMEM budget — the compile-abort class of docs/BENCH_NOTES.md round 3
    must never come back."""
    import glob
    import os

    from artensor_tpu import plan_io
    from artensor_tpu.runtime.gatherk import (GK_VMEM_BUDGET, GKPlan,
                                              plan_window_bytes)
    from artensor_tpu.runtime.sparse import contraction_scheme_sparse

    root = os.path.join(os.path.dirname(__file__), "..")
    plans = sorted(glob.glob(os.path.join(root, "plans",
                                          "n30_m14_sparse_sc2*.json")))
    assert plans
    bits = [np.binary_repr(i, 30) for i in range(64)]
    checked = 0
    for path in plans[:4]:          # bounded: compile cost ~seconds each
        sc = float(path.rsplit("sc", 1)[1].split("_")[0].split(".")[0])
        _, _, ctree = plan_io.load_plan(path)
        steps, _, _ = contraction_scheme_sparse(ctree, bits, sc_target=sc,
                                                negotiate=False)
        for s in steps:
            if isinstance(s.lane, GKPlan):
                assert plan_window_bytes(s.lane) <= GK_VMEM_BUDGET, path
                checked += 1
    assert checked > 10


@pytest.mark.skipif(
    not os.path.exists("/root/reference/examples/"
                       "circuit_n30_m14_s0_e0_pEFGH.py"),
    reason="reference data absent")
def test_headline_scheme_kernel_steps_oracle():
    """Every DISTINCT kernel signature of the fused+negotiated headline
    scheme verifies against the einsum oracle in interpret mode — the
    fused gate blocks create K/H combinations (up to 128x128) that no
    smaller circuit exercises."""
    import time

    from artensor_tpu import plan_io
    from artensor_tpu.circuits import TensorNetworkCircuit, load_cirq_circuit
    from artensor_tpu.network import NumericalTensorNetwork
    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime.executor import stage_tensors
    from artensor_tpu.runtime.gatherk import GKPlan, apply_gk_step
    from artensor_tpu.runtime.lanes import PairPlan, apply_pair_step
    from artensor_tpu.runtime.lowering import _prod
    from artensor_tpu.runtime.scheme_cache import cached_scheme_sparse

    plan_path = os.path.join(os.path.dirname(__file__), "..", "plans",
                             "n30_m14_sparse_sc22.json")
    if not os.path.exists(plan_path):
        pytest.skip("plan absent")
    with open("/root/reference/examples/"
              "amplitudes_n30_m14_s0_e0_pEFGH_10000.txt") as f:
        bitstrings = [ln.split()[0] for ln in f if ln.strip()][:1000]
    n, layers = load_cirq_circuit(
        "/root/reference/examples/circuit_n30_m14_s0_e0_pEFGH.py")
    circ = TensorNetworkCircuit((n, layers))
    tensors, tb, bd, fq = circ.to_numerical_tn()
    ntn = NumericalTensorNetwork(tensors, tb, bd, fq)
    ntn.simplify("sparse")
    order, sliced, ctree = plan_io.load_plan(plan_path)
    steps, _, _ = cached_scheme_sparse(plan_path, ctree, bitstrings, 22.0)
    field = make_field(np.complex64, "highest", "split")
    rng = np.random.default_rng(0)
    seen = set()
    checked = 0
    for s in steps:
        ln = s.lane
        # gathered (aligned) steps carry chunked lowering and are
        # oracle-checked by the _ggk_oracle cases below
        if ln is None or getattr(s, "gathers", None) is not None:
            continue
        sig = (type(ln).__name__, getattr(ln, "K", None),
               getattr(ln, "H", None), getattr(ln, "fm", None),
               getattr(ln, "qb", None), getattr(ln, "gt", None),
               getattr(ln, "pre", None) is None,
               getattr(ln, "use_mxu", None))
        if sig in seen:
            continue
        seen.add(sig)
        low = s.lowered
        swapped = getattr(low, "swapped", False)
        size_i = _prod(low.shape_r if swapped else low.shape_l)
        size_j = _prod(low.shape_l if swapped else low.shape_r)

        def dims_for(ix, size):
            if 2 ** len(ix) == size:
                return (2,) * len(ix)
            return (size // 2 ** (len(ix) - 1),) + (2,) * (len(ix) - 1)

        dims_i = dims_for(s.ix_i, size_i)
        dims_j = dims_for(s.ix_j, size_j)
        xi = (rng.standard_normal(dims_i)
              + 1j * rng.standard_normal(dims_i)).astype(np.complex64)
        xj = (rng.standard_normal(dims_j)
              + 1j * rng.standard_normal(dims_j)).astype(np.complex64)
        want = np.einsum(xi, list(s.ix_i), xj, list(s.ix_j), list(s.iy),
                         optimize=True)
        sx, sy = stage_tensors(field, [xi, xj])
        if isinstance(ln, GKPlan):
            got = apply_gk_step(field, sx, sy, ln, interpret=True)
        else:
            assert isinstance(ln, PairPlan)
            got = apply_pair_step(field, sx, sy, ln, interpret=True)
        g = field.unwrap(got).reshape(want.shape)
        err = np.abs(g - want).max() / max(np.abs(want).max(), 1e-30)
        assert err < 2e-5, (sig, err)
        checked += 1
    assert checked >= 6      # distinct signatures incl. fused K=H=128


# -- gathered gather-K (aligned steps) --------------------------------------

def _ggk_oracle(rx_i, rx_j, riy, rd_i, rd_j, B, bi, bj, width=0, seed=0,
                w_unbatched=False, vmem_budget=None, sort_gi=False):
    """Build an aligned-step instance, run the GGK kernel (interpret) and
    check against the take+einsum reference.

    ``w_unbatched``: vmap the X pair only (W in_axes None — the
    slice-invariant small-operand fast path).  ``vmem_budget``: shrink
    GK_VMEM_BUDGET so the call walks width chunks via the leading grid
    axis.  ``sort_gi``: lexsort the gathers gi-major (the compiler's
    run-grouping order)."""
    from artensor_tpu.runtime.gatherk import apply_ggk_step, plan_ggk_step

    rng = np.random.default_rng(seed)
    gi = rng.integers(0, bi, B).astype(np.int32)
    gj = rng.integers(0, bj, B).astype(np.int32)
    if sort_gi:
        sidx = np.lexsort((gj, gi))
        gi, gj = gi[sidx], gj[sidx]
    old_min, old_slack = gk.GGK_MIN_WORK, gk.SLACK
    gk.GGK_MIN_WORK, gk.SLACK = 1, 1e9
    try:
        plan = plan_ggk_step(rx_i, rx_j, riy, rd_i, rd_j, gi, gj, bi, bj)
    finally:
        gk.GGK_MIN_WORK, gk.SLACK = old_min, old_slack
    assert plan is not None, gk.LAST_REJECT
    shp_i = (width, bi, *rd_i) if width else (bi, *rd_i)
    shp_j = (bj, *rd_j) if w_unbatched or not width \
        else (width, bj, *rd_j)
    x = (rng.standard_normal(shp_i) + 1j * rng.standard_normal(shp_i)) \
        .astype(np.complex64)
    w = (rng.standard_normal(shp_j) + 1j * rng.standard_normal(shp_j)) \
        .astype(np.complex64)
    lab = {l: k for k, l in enumerate({*rx_i, *rx_j, *riy})}
    wlab, blab = len(lab), len(lab) + 1
    xg = np.take(x, gi, axis=1 if width else 0)
    w_lead = bool(width) and not w_unbatched
    wg = np.take(w, gj, axis=1 if w_lead else 0)
    lead = [wlab] if width else []
    want = np.einsum(xg, [*lead, blab, *[lab[l] for l in rx_i]],
                     wg, [*(lead if w_lead else []), blab,
                          *[lab[l] for l in rx_j]],
                     [*lead, blab, *[lab[l] for l in riy]])
    field = make_field(np.complex64, "highest", "split")
    import jax

    def apply_gg(field, xs, ws, plan):
        return apply_ggk_step(field, xs, ws, plan, interpret=True)

    old_budget = gk.GK_VMEM_BUDGET
    if vmem_budget is not None:
        gk.GK_VMEM_BUDGET = vmem_budget
    try:
        if width and w_unbatched:
            xs = field.wrap(x.reshape(width, -1))
            ws = field.wrap(w.reshape(-1))
            got = jax.vmap(
                lambda a, b: apply_gg(field, (a, b), ws, plan))(
                xs[0], xs[1])
        elif width:
            xs = field.wrap(x.reshape(width, -1))
            ws = field.wrap(w.reshape(width, -1))
            got = jax.vmap(lambda a, b, c, d: apply_gg(
                field, (a, b), (c, d), plan))(xs[0], xs[1], ws[0], ws[1])
        else:
            xs = field.wrap(x.reshape(-1))
            ws = field.wrap(w.reshape(-1))
            got = apply_gg(field, xs, ws, plan)
    finally:
        gk.GK_VMEM_BUDGET = old_budget
    g = field.unwrap(got).reshape(want.shape)
    err = np.abs(g - want).max() / max(np.abs(want).max(), 1e-30)
    assert err < 2e-4, err
    return plan


def test_ggk_basic_mxu():
    # rows: X (k0,k1 contract; f free run), W (k0,k1, h fresh)
    _ggk_oracle(("k0", "k1", "f0", "f1"), ("k0", "k1", "h"),
                ("h", "f0", "f1"),
                (2, 4, 2, 128), (2, 4, 2), B=24, bi=6, bj=5)


def test_ggk_vpu_and_grid_leg():
    # a g leg (stays in the output, not in the f run position)
    plan = _ggk_oracle(("g", "k", "f0", "f1"), ("k", "h"),
                       ("g", "h", "f0", "f1"),
                       (3, 4, 2, 128), (4, 2), B=17, bi=4, bj=3)
    assert any(a[0] == "g" for a in plan.row.x_axes)


def test_ggk_batched_widths():
    for width in (2, 4):
        _ggk_oracle(("k0", "k1", "f0", "f1"), ("k0", "k1", "h"),
                    ("h", "f0", "f1"),
                    (2, 4, 2, 128), (2, 4, 2), B=12, bi=5, bj=4,
                    width=width, seed=width)


def test_ggk_unbatched_w():
    """Slice-invariant W (vmap in_axes None): gathered once, every width
    program reads the same window — no broadcast materialization."""
    for width in (2, 4):
        _ggk_oracle(("k0", "k1", "f0", "f1"), ("k0", "k1", "h"),
                    ("h", "f0", "f1"),
                    (2, 4, 2, 128), (2, 4, 2), B=12, bi=5, bj=4,
                    width=width, seed=10 + width, w_unbatched=True)


def test_ggk_chunked_grid():
    """A tiny VMEM budget forces width chunking via the leading grid axis
    (round 3 staged chunks with lax.map copies instead) — batched and
    unbatched W, MXU and reduction rows."""
    common = dict(B=12, bi=5, bj=4, width=4)
    # MXU row, batched W; budget forces wc=1
    _ggk_oracle(("k0", "k1", "f0", "f1"), ("k0", "k1", "h"),
                ("h", "f0", "f1"),
                (2, 4, 2, 128), (2, 4, 2), seed=21,
                vmem_budget=40_000, **common)
    # MXU row, unbatched W
    _ggk_oracle(("k0", "k1", "f0", "f1"), ("k0", "k1", "h"),
                ("h", "f0", "f1"),
                (2, 4, 2, 128), (2, 4, 2), seed=22,
                vmem_budget=40_000, w_unbatched=True, **common)
    # reduction row, batched + unbatched W
    _ggk_oracle(("k0", "k1", "f0", "k2", "f1"), ("k1", "k0", "k2", "h"),
                ("h", "f0", "f1"),
                (4, 2, 2, 16, 4), (2, 4, 16, 2), seed=23,
                vmem_budget=20_000, **common)
    _ggk_oracle(("k0", "k1", "f0", "k2", "f1"), ("k1", "k0", "k2", "h"),
                ("h", "f0", "f1"),
                (4, 2, 2, 16, 4), (2, 4, 16, 2), seed=24,
                vmem_budget=20_000, w_unbatched=True, **common)


def test_ggk_rejections():
    from artensor_tpu.runtime.gatherk import plan_ggk_step

    gi = np.zeros(8, np.int32)
    gj = np.zeros(8, np.int32)
    # W row too big
    assert plan_ggk_step(("k", "f"), ("k", "h"), ("h", "f"),
                         (2, 256), (2, 1 << 14), gi, gj, 2, 2) is None
    # whole-step work too small
    assert plan_ggk_step(("k", "f"), ("k", "h"), ("h", "f"),
                         (2, 128), (2, 2), gi, gj, 2, 2) is None


def test_ggk_reduction_form():
    # step173 class: huge scattered K, tiny interleaved frees, tiny fresh
    # row X: (k0, k1, f0, k2, f1) contract k0,k1,k2; W: (k0,k1,k2,h)
    plan = _ggk_oracle(("k0", "k1", "f0", "k2", "f1"),
                       ("k1", "k0", "k2", "h"),
                       ("h", "f0", "f1"),
                       (4, 2, 2, 16, 4), (2, 4, 16, 2), B=40, bi=7, bj=6)
    from artensor_tpu.runtime.gatherk import RGRow
    assert isinstance(plan.row, RGRow)
    assert plan.row.pre_perm is not None      # stored order is interleaved


def test_ggk_reduction_h_trailing_and_h1():
    from artensor_tpu.runtime.gatherk import RGRow

    # frees-first output, fresh trailing
    plan = _ggk_oracle(("k0", "f0", "k1"), ("k0", "k1", "h"),
                       ("f0", "h"),
                       (8, 4, 16), (8, 16, 2), B=24, bi=5, bj=4, seed=3)
    assert isinstance(plan.row, RGRow)
    # H == 1 (W fully contracted)
    plan = _ggk_oracle(("k0", "f0", "k1"), ("k1", "k0"),
                       ("f0",),
                       (8, 4, 16), (16, 8), B=24, bi=5, bj=4, seed=4)
    assert isinstance(plan.row, RGRow)


def test_ggk_reduction_batched():
    from artensor_tpu.runtime.gatherk import RGRow

    plan = _ggk_oracle(("k0", "k1", "f0", "k2", "f1"),
                       ("k1", "k0", "k2", "h"),
                       ("h", "f0", "f1"),
                       (4, 2, 2, 16, 4), (2, 4, 16, 2), B=16, bi=5, bj=4,
                       width=4, seed=7)
    assert isinstance(plan.row, RGRow)


def test_ggk_reduction_no_frees_and_mosaic_blocks():
    """The sc23_r2 crash class: RG rows with NO free legs (view_x=(K,))
    put the gathered row axis (block 1) second-minor unless the specs pad
    rank-1 views — interpret mode never checks Mosaic's last-two-dims
    rule, so assert it directly on the BlockSpecs here."""
    from artensor_tpu.runtime.gatherk import (
        RGRow, _rg_pad, _rg_specs, _rg_view_y, _rg_wshape, plan_ggk_step)

    def check_specs(plan, width):
        row = plan.row
        grid, xspec, wspec, yspec = _rg_specs(plan, width)
        lead = (width,) if width else ()
        arrays = {
            "x": (lead + (plan.bi_rows,) + _rg_pad(row.view_x), xspec),
            "w": (lead + (plan.bj_rows, row.H) + _rg_wshape(row), wspec),
            "y": (lead + (plan.B,) + _rg_pad(_rg_view_y(row)), yspec),
        }
        for name, (arr, spec) in arrays.items():
            blk = spec.block_shape
            assert len(blk) == len(arr), (name, blk, arr)
            for bdim, adim, (div, pos) in zip(
                    blk[-2:], arr[-2:], ((8, "sublane"), (128, "lane"))):
                assert bdim == adim or bdim % div == 0, \
                    f"{name} {pos}: block {blk} vs array {arr}"

    # no-frees: X fully contracted except the gather row (view_x=(K,))
    gi = np.arange(24, dtype=np.int32) % 5
    gj = np.arange(24, dtype=np.int32) % 4
    old_min, old_slack = gk.GGK_MIN_WORK, gk.SLACK
    gk.GGK_MIN_WORK, gk.SLACK = 1, 1e9
    try:
        plan = plan_ggk_step(("k0", "k1"), ("k1", "k0", "h"), ("h",),
                             (16, 16), (16, 16, 4), gi, gj, 5, 4)
    finally:
        gk.GGK_MIN_WORK, gk.SLACK = old_min, old_slack
    assert plan is not None and isinstance(plan.row, RGRow), gk.LAST_REJECT
    for width in (0, 8):
        check_specs(plan, width)

    # rank-1 output with frees (H == 1) and the standard rank-2 case
    p2 = _ggk_oracle(("k0", "f0", "k1"), ("k1", "k0"), ("f0",),
                     (8, 4, 16), (16, 8), B=24, bi=5, bj=4, seed=4)
    for width in (0, 4):
        check_specs(p2, width)
    p3 = _ggk_oracle(("k0", "k1", "f0", "k2", "f1"),
                     ("k1", "k0", "k2", "h"), ("h", "f0", "f1"),
                     (4, 2, 2, 16, 4), (2, 4, 16, 2), B=16, bi=5, bj=4,
                     seed=7)
    for width in (0, 4):
        check_specs(p3, width)

    # end-to-end correctness of the no-frees form (interpret)
    _ggk_oracle(("k0", "k1"), ("k1", "k0", "h"), ("h",),
                (16, 16), (16, 16, 4), B=24, bi=5, bj=4, seed=9)
    _ggk_oracle(("k0", "k1"), ("k1", "k0", "h"), ("h",),
                (16, 16), (16, 16, 4), B=24, bi=5, bj=4, width=4, seed=10)


# -- flat-row reduction (RGFlat: the 10k batch-junction class) --------------

def test_ggk_flat_row_basic():
    """RGFlat: small scattered contract (K=32 < RG_K_MIN), interleaved
    frees, raw flat-row DMA with in-VMEM digit bookkeeping — the shape
    class the 10k scheme's aligned merges have (step-169 anatomy:
    rows (4, 32, 4) x (32,) -> (4, 4))."""
    from artensor_tpu.runtime.gatherk import RGFlat

    plan = _ggk_oracle(
        ("f0", "f1", "k0", "k1", "k2", "k3", "k4", "f2", "f3"),
        ("k0", "k1", "k2", "k3", "k4"),
        ("f0", "f1", "f2", "f3"),
        (2,) * 9, (2,) * 5, B=23, bi=6, bj=5)
    assert isinstance(plan.row, RGFlat), type(plan.row).__name__
    assert plan.row.K == 32 and plan.row.F == 16 and plan.row.H == 1


def test_ggk_flat_row_fresh_legs():
    """RGFlat with fresh W legs (H > 1, leading in riy) and a W digit
    order that differs from X's contract order (wk digit transpose)."""
    from artensor_tpu.runtime.gatherk import RGFlat

    plan = _ggk_oracle(
        ("f0", "k0", "k1", "k2", "k3", "k4", "f1", "f2"),
        ("k2", "k0", "k4", "k1", "k3", "h0", "h1"),
        ("h0", "h1", "f0", "f1", "f2"),
        (2,) * 8, (2,) * 7, B=19, bi=5, bj=4, seed=3)
    assert isinstance(plan.row, RGFlat)
    assert plan.row.H == 4


def test_ggk_flat_row_widths():
    """RGFlat under the slice vmap: width folded into the block DMA,
    plus the slice-invariant-W fast path."""
    from artensor_tpu.runtime.gatherk import RGFlat

    for width in (2, 4):
        plan = _ggk_oracle(
            ("f0", "f1", "k0", "k1", "k2", "k3", "k4", "f2", "f3"),
            ("k0", "k1", "k2", "k3", "k4"),
            ("f0", "f1", "f2", "f3"),
            (2,) * 9, (2,) * 5, B=12, bi=5, bj=4,
            width=width, seed=20 + width)
        assert isinstance(plan.row, RGFlat)
    plan = _ggk_oracle(
        ("f0", "f1", "k0", "k1", "k2", "k3", "k4", "f2", "f3"),
        ("k0", "k1", "k2", "k3", "k4"),
        ("f0", "f1", "f2", "f3"),
        (2,) * 9, (2,) * 5, B=12, bi=5, bj=4,
        width=4, seed=30, w_unbatched=True)
    assert isinstance(plan.row, RGFlat)


def test_ggk_flat_row_rejections():
    """RGFlat gates: short rows, out-of-order frees, trailing fresh."""
    from artensor_tpu.runtime import gatherk as gkm

    # short row (xrow 16 < RGF_ROW_MIN): the 10k step-179 shape stays XLA
    assert gkm.plan_rg_flat(("f0", "k0", "k1", "f1"), ("k0", "k1"),
                            ("f0", "f1"), (2, 2, 2, 2), (2, 2)) is None
    assert "row-small" in str(gkm.LAST_REJECT)
    # frees out of stored order (flat store would need a transpose)
    assert gkm.plan_rg_flat(
        ("f0", "f1", "k0", "k1", "k2", "k3", "k4", "f2", "f3"),
        ("k0", "k1", "k2", "k3", "k4"),
        ("f2", "f3", "f0", "f1"),
        (2,) * 9, (2,) * 5) is None
    assert "f-order" in str(gkm.LAST_REJECT)
    # fresh block not leading in riy (per-h store is a flat slice)
    assert gkm.plan_rg_flat(
        ("f0", "f1", "k0", "k1", "k2", "k3", "k4", "f2", "f3"),
        ("k0", "k1", "k2", "k3", "k4", "h"),
        ("f0", "f1", "f2", "f3", "h"),
        (2,) * 9, (2,) * 6) is None
    assert "h-lead" in str(gkm.LAST_REJECT)
