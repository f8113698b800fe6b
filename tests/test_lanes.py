"""Lane executor unit tests: plan invariants + kernel vs einsum oracle.

The big-step threshold (MIN_X_ELEMS = 2^16) keeps the circuit-level tests
on the XLA path, so these tests build synthetic steps just above the
threshold and force every structural feature through the Pallas kernel in
interpret mode: head/tail orientations, combo legs, grid-leg hoisting and
pinned (batch-like) legs.
"""

import numpy as np
import pytest

from artensor_tpu.ops.field import make_field
from artensor_tpu.runtime import lanes
from artensor_tpu.runtime.lanes import (
    PairPlan,
    apply_lane_step,
    apply_pair_step,
    plan_lane_step,
    plan_pair_step,
    schedule_step,
)


def _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan, seed=0):
    """Execute the plan in interpret mode and compare against einsum."""
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
    if type(plan).__name__ == "GKPlan":
        from artensor_tpu.runtime.gatherk import apply_gk_step
        got = apply_gk_step(field, xs, ws, plan, interpret=True)
    else:
        got = apply_lane_step(field, xs, ws, plan, interpret=True)
    got = field.unwrap(got).reshape([dict(zip(ix_x, dims_x),
                                          **dict(zip(ix_w, dims_w)))[l]
                                     for l in iy])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_head_plan_basic():
    # X (a,b,c,d) = (4, 32, 128, 16): contract (a, b) with W -> new (n, m)
    ix_x = ("a", "b", "c", "d")
    dims_x = (4, 32, 128, 16)
    ix_w = ("a", "b", "n", "m")
    dims_w = (4, 32, 4, 4)
    iy = ("n", "m", "c", "d")
    plan = plan_lane_step(ix_x, ix_w, iy, dims_x, dims_w,
                          lane_count=2, orient="head")
    assert plan is not None and plan.orient == "head"
    assert plan.L == 128 and plan.n_combos == 1
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_head_plan_combo_and_hoist():
    # contract legs (a, e): a in lanes, e deep in rows -> combo; hoist g
    # (the combo leg sits between the hoisted g and the f run: a squeezed
    # axis may not occupy the last two block positions, a full one may)
    ix_x = ("a", "b", "c", "g", "e", "d")
    dims_x = (64, 2, 64, 2, 2, 256)
    ix_w = ("a", "e", "n")
    dims_w = (64, 2, 8)
    # g hoisted to the front; h = (b: lane-free, n: new) contiguous, and
    # the H block stays adjacent to the f run so no squeezed axis lands
    # in the last two output block positions
    iy = ("g", "c", "b", "n", "d")
    plan = plan_lane_step(ix_x, ix_w, iy, dims_x, dims_w,
                          lane_count=2, orient="head")
    assert plan is not None
    assert plan.n_combos == 2
    assert ("g", "g") in plan.x_axes
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_tail_plan_basic():
    # contract legs at the TAIL of X
    ix_x = ("c", "d", "a", "b")
    dims_x = (128, 16, 4, 32)
    ix_w = ("a", "b", "n")
    dims_w = (4, 32, 16)
    iy = ("c", "d", "n")
    plan = plan_lane_step(ix_x, ix_w, iy, dims_x, dims_w,
                          lane_count=2, orient="tail")
    assert plan is not None and plan.orient == "tail"
    assert plan.L == 128
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_pinned_leading_leg():
    # a batch-like pinned leg stays the leading output axis
    ix_x = ("B", "a", "b", "c")
    dims_x = (6, 4, 32, 512)
    ix_w = ("a", "b", "n")
    dims_w = (4, 32, 8)
    iy = ("B", "n", "c")
    plan = plan_lane_step(ix_x, ix_w, iy, dims_x, dims_w,
                          lane_count=2, pin=1, orient="head")
    assert plan is not None
    assert plan.y_axes[0] == ("g", "B")
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_schedule_step_places_consumer_contract_first():
    ix_x = ("a", "b", "c", "d")
    dims_x = (4, 32, 128, 16)
    ix_w = ("a", "b", "n", "m")
    dims_w = (4, 32, 4, 4)
    iy_set = {"n", "m", "c", "d"}
    iy, plan = schedule_step(ix_x, ix_w, iy_set, dims_x, dims_w,
                             consumer_contract={"m"})
    assert plan is not None
    # the consumer's contract leg leads the chosen output order
    assert iy[0] == "m"
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_tail_orientation_via_knob(monkeypatch):
    """The tail orientation stays available behind the ORIENTATIONS knob."""
    monkeypatch.setattr(lanes, "ORIENTATIONS", ("head", "tail"))
    ix_x = ("c", "a", "b")
    dims_x = (1024, 8, 16)
    ix_w = ("a", "b", "n")
    dims_w = (8, 16, 32)
    iy_set = {"c", "n"}
    iy, plan = schedule_step(ix_x, ix_w, iy_set, dims_x, dims_w)
    assert plan is not None
    _run_and_check(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_both_big_pair_kernel():
    # both operands big with contract leading -> the fused pair kernel
    ix_x = ("a", "b", "c")
    dims_x = (64, 64, 32)
    ix_w = ("a", "d", "e")
    dims_w = (64, 64, 32)
    iy_set = {"b", "c", "d", "e"}
    iy, plan = schedule_step(ix_x, ix_w, iy_set, dims_x, dims_w)
    assert isinstance(plan, PairPlan) and plan.K == 64
    _run_and_check_pair(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_pair_kernel_k_order_mismatch():
    # the j operand's contract legs arrive in a different order: the plan
    # carries a K-row permutation
    ix_x = ("a", "b", "c", "d")
    dims_x = (8, 16, 64, 32)
    ix_w = ("b", "a", "e")
    dims_w = (16, 8, 256)
    iy = ("c", "d", "e")
    plan = plan_pair_step(ix_x, ix_w, iy, dims_x, dims_w)
    assert isinstance(plan, PairPlan)
    # either mechanism is fine: a K-row permutation or an input transpose
    assert plan.v_perm is not None or plan.re_j is not None
    _run_and_check_pair(ix_x, ix_w, iy, dims_x, dims_w, plan)


def _run_and_check_pair(ix_x, ix_w, iy, dims_x, dims_w, plan, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(dims_x) + 1j * rng.standard_normal(dims_x)) \
        .astype(np.complex64)
    w = (rng.standard_normal(dims_w) + 1j * rng.standard_normal(dims_w)) \
        .astype(np.complex64)
    lab = {l: k for k, l in enumerate({*ix_x, *ix_w, *iy})}
    want = np.einsum(x, [lab[l] for l in ix_x], w, [lab[l] for l in ix_w],
                     [lab[l] for l in iy])
    field = make_field(np.complex64, "highest", "split")
    got = apply_pair_step(field, field.wrap(x.reshape(-1)),
                          field.wrap(w.reshape(-1)), plan, interpret=True)
    dim_of = dict(zip(ix_x, dims_x), **dict(zip(ix_w, dims_w)))
    got = field.unwrap(got).reshape([dim_of[l] for l in iy])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_pair_kernel_scattered_contract_pre_permute():
    # contract legs NOT leading in either operand: input pre-permutes
    # (cheap run-collapsed transposes) deliver the (K, rows) form
    ix_x = ("m1", "a", "m2", "b")
    dims_x = (16, 8, 128, 16)
    ix_w = ("n1", "b", "a", "n2")
    dims_w = (16, 16, 8, 16)
    iy = ("m1", "m2", "n1", "n2")
    plan = plan_pair_step(ix_x, ix_w, iy, dims_x, dims_w)
    assert isinstance(plan, PairPlan)
    assert plan.re_i is not None and plan.re_j is not None
    assert plan.K == 128
    _run_and_check_pair(ix_x, ix_w, iy, dims_x, dims_w, plan)


def test_kernel_precision_clamped_to_mosaic_support():
    # Mosaic rejects Precision.HIGH (bf16x3) inside a kernel: 'high'
    # fields must clamp to HIGHEST; 'default'/'highest' pass through.
    from jax import lax

    from artensor_tpu.runtime.lanes import kernel_precision

    assert kernel_precision(make_field(np.complex64, "highest", "split")) \
        == lax.Precision.HIGHEST
    assert kernel_precision(make_field(np.complex64, "high", "split")) is None
    assert kernel_precision(make_field(np.complex64, "default", "split")) \
        == lax.Precision.DEFAULT


def test_lane_kernel_with_high_precision_field():
    # end-to-end: a 'high'-precision field still runs the lane kernel
    # (clamped dot precision) and matches the einsum oracle
    rng = np.random.default_rng(3)
    ix_x, dims_x = ("a", "b", "c", "d"), (4, 32, 128, 16)
    ix_w, dims_w = ("a", "b", "n", "m"), (4, 32, 4, 4)
    iy = ("n", "m", "c", "d")
    x = (rng.standard_normal(dims_x) + 1j * rng.standard_normal(dims_x)) \
        .astype(np.complex64)
    w = (rng.standard_normal(dims_w) + 1j * rng.standard_normal(dims_w)) \
        .astype(np.complex64)
    lab = {l: k for k, l in enumerate({*ix_x, *ix_w, *iy})}
    want = np.einsum(x, [lab[l] for l in ix_x], w, [lab[l] for l in ix_w],
                     [lab[l] for l in iy])
    plan = plan_lane_step(ix_x, ix_w, iy, dims_x, dims_w,
                          lane_count=2, orient="head")
    assert plan is not None
    field = make_field(np.complex64, "high", "split")
    got = apply_lane_step(field, field.wrap(x.reshape(-1)),
                          field.wrap(w.reshape(-1)), plan, interpret=True)
    got = field.unwrap(got).reshape([dict(zip(ix_x, dims_x),
                                          **dict(zip(ix_w, dims_w)))[l]
                                     for l in iy])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_vmem_window_gate_rejects_small_minor_combo():
    """A combo (row-contract) axis stored MINOR inflates the Mosaic VMEM
    window 64x (dim 2 padded to the 128-lane tile) — the sc25 plan sweep
    aborted compile at 318MB scoped VMEM on exactly this form.  The
    planner must reject it; the same step with the combo leg stored
    before the f run fits and plans."""
    from artensor_tpu.runtime import lanes

    lane_legs = [f"a{k}" for k in range(7)]   # L=128, contract
    f_legs = [f"f{k}" for k in range(14)]     # F=16384
    h_legs = [f"h{k}" for k in range(5)]      # H=32
    ix_w = tuple(lane_legs + ["c0"] + h_legs)
    iy = tuple(h_legs + f_legs)
    dims_w = (2,) * len(ix_w)

    ix_x = tuple(lane_legs + f_legs + ["c0"])     # combo minor: reject
    p = plan_lane_step(ix_x, ix_w, iy, (2,) * len(ix_x), dims_w)
    assert p is None
    assert lanes.LAST_REJECT == "vmem"

    ix_x2 = tuple(lane_legs + ["c0"] + f_legs)    # combo early: plans
    p2 = plan_lane_step(ix_x2, ix_w, iy, (2,) * len(ix_x2), dims_w)
    assert p2 is not None
    assert p2.block >= 128


def test_padded_elems_tile_rounding():
    from artensor_tpu.runtime.lanes import _padded_elems

    assert _padded_elems([64, 2048, 2]) == 64 * 2048 * 128
    assert _padded_elems([128, 2, 1024]) == 128 * 8 * 1024
    assert _padded_elems([256]) == 256
    assert _padded_elems([100]) == 128
    assert _padded_elems([]) == 1


def test_pair_kernel_vmap_batching_rule():
    """vmapped pair steps take the custom rule: batch = leading grid axis
    with per-instance windows.  Oracle-checked batched-both and
    batched-X/shared-V."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    K, M, N = 128, 256, 256
    ix_i = ("k1", "m1")
    ix_j = ("k1", "n1")
    iy = ("m1", "n1")
    plan = plan_pair_step(ix_i, ix_j, iy, (K, M), (K, N))
    assert plan is not None

    W = 3
    xs = (rng.standard_normal((W, K, M)) + 1j
          * rng.standard_normal((W, K, M))).astype(np.complex64)
    vs = (rng.standard_normal((W, K, N)) + 1j
          * rng.standard_normal((W, K, N))).astype(np.complex64)
    field = make_field(np.complex64, "highest", "split")

    def one(xf, vf):
        return apply_pair_step(field, xf, vf, plan, interpret=True)

    def wrap_b(a):
        return (jnp.asarray(a.real.reshape(W, -1).astype(np.float32)),
                jnp.asarray(a.imag.reshape(W, -1).astype(np.float32)))

    got = jax.vmap(one, in_axes=((0, 0), (0, 0)))(wrap_b(xs), wrap_b(vs))
    want = np.einsum("wkm,wkn->wmn", xs, vs)
    out = (np.asarray(got[0]) + 1j * np.asarray(got[1])).reshape(want.shape)
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=1e-4)

    got2 = jax.vmap(one, in_axes=((0, 0), None))(
        wrap_b(xs), field.wrap(vs[0].reshape(-1)))
    want2 = np.einsum("wkm,kn->wmn", xs, vs[0])
    out2 = (np.asarray(got2[0]) + 1j * np.asarray(got2[1])).reshape(want2.shape)
    np.testing.assert_allclose(out2, want2, rtol=2e-4, atol=1e-4)
