"""Chip microbench: reduction-form GGK (RGRow) vs the XLA aligned path
at the step173-class shape (huge scattered K, tiny interleaved frees).

The plan-time model prices the padded-vreg multiply at VPU_FLOPS_PER_S
over PADDED elements and rejects (est 8.4us/row vs 0.36ms/slice
traffic); this measures the real rate to calibrate RG_PAD-aware pricing.

Usage: python scripts/proto_rg.py [B bi bj width]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from artensor_tpu.ops.field import make_field
    from artensor_tpu.runtime import gatherk as gk
    from artensor_tpu.runtime.gatherk import apply_ggk_step, plan_ggk_step

    args = [int(a) for a in sys.argv[1:]]
    B, bi, bj, width = (args + [1008, 512, 512, 8][len(args):])[:4]

    # step173 class: row X (2, 4, [f]2, 512, [f]4), W (2, 4, 512, [h]2)
    rx_i = ("k0", "k1", "f0", "k2", "f1")
    rd_i = (2, 4, 2, 512, 4)
    rx_j = ("k0", "k1", "k2", "h")
    rd_j = (2, 4, 512, 2)
    riy = ("h", "f0", "f1")
    rng = np.random.default_rng(0)
    gi = np.sort(rng.integers(0, bi, B).astype(np.int32))
    gj = rng.integers(0, bj, B).astype(np.int32)
    old = gk.SLACK
    gk.SLACK = 1e9
    try:
        plan = plan_ggk_step(rx_i, rx_j, riy, rd_i, rd_j, gi, gj, bi, bj)
    finally:
        gk.SLACK = old
    assert plan is not None, gk.LAST_REJECT
    print(f"row type {type(plan.row).__name__}, modeled est "
          f"{plan.est_s*1e3:.2f} ms/slice")

    field = make_field(np.complex64, "highest", "split")
    shp_i, shp_j = (width, bi) + rd_i, (width, bj) + rd_j
    x = (rng.standard_normal(shp_i) + 1j * rng.standard_normal(shp_i)) \
        .astype(np.complex64)
    w = (rng.standard_normal(shp_j) + 1j * rng.standard_normal(shp_j)) \
        .astype(np.complex64)
    xs = jax.device_put(field.wrap(x.reshape(width, -1)))
    ws = jax.device_put(field.wrap(w.reshape(width, -1)))
    gi_d, gj_d = jax.device_put((jnp.asarray(gi), jnp.asarray(gj)))

    def rg(xr, xi, wr, wi):
        yr, yi = jax.vmap(lambda a, b, c, d: apply_ggk_step(
            field, (a, b), (c, d), plan, interpret=False))(xr, xi, wr, wi)
        return yr, yi

    def xla(xr, xi, wr, wi):
        def one(a, c):
            ag = jnp.take(a.reshape((bi,) + rd_i), gi_d, axis=0)
            cg = jnp.take(c.reshape((bj,) + rd_j), gj_d, axis=0)
            return ag, cg
        agr, cgr = jax.vmap(one)(xr, wr)
        agi, cgi = jax.vmap(one)(xi, wi)
        X = lambda a: a.reshape(width, B, 2, 4, 2, 512, 4)
        Wm = lambda c: c.reshape(width, B, 2, 4, 512, 2)
        e = partial(jnp.einsum, "wbpqfrg,wbpqrh->wbhfg",
                    precision=lax.Precision.HIGHEST)
        return (e(X(agr), Wm(cgr)) - e(X(agi), Wm(cgi)),
                e(X(agr), Wm(cgi)) + e(X(agi), Wm(cgr)))

    def scan16(base):
        # NB: perturbing the operand (xr + 0.0*c) re-materializes it with
        # an XLA-chosen layout the Mosaic kernel then rejects at remote
        # compile (scripts/rg_compile_probe.py: the same shapes compile
        # fine standalone).  An optimization_barrier defeats CSE without
        # touching the layout.
        def wrapped(gix, xr, xi, wr, wi):
            def body(c, _):
                # tying the barrier to the carry defeats loop-invariant
                # hoisting too, at zero layout/value change
                xr2, _c = jax.lax.optimization_barrier((xr, c))
                yr, yi = base(xr2, xi, wr, wi)
                return yr.ravel()[0] * 0 + _c, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=8)
            return c
        return jax.jit(wrapped)

    for tag, base in [("rg-kernel", rg), ("xla", xla)]:
        f = scan16(base)
        try:
            r = jax.block_until_ready(f(gi_d, xs[0], xs[1], ws[0], ws[1]))
        except Exception as e:
            print(f"{tag}: FAILED {str(e)[:200]}")
            continue
        ts = []
        for _ in range(3):
            t0 = time.time()
            r = jax.block_until_ready(f(gi_d, xs[0], xs[1], ws[0], ws[1]))
            _ = np.asarray(r)
            ts.append(time.time() - t0)
        t = float(np.median(ts)) / 8
        per_slice = t / width
        print(f"{tag}: {t*1e3:.2f} ms/call = {per_slice*1e3:.3f} ms/slice")

    # correctness (single width slice against numpy)
    yr, yi = jax.vmap(lambda a, b, c, d: apply_ggk_step(
        field, (a, b), (c, d), plan, interpret=False))(
        xs[0], xs[1], ws[0], ws[1])
    got = (np.asarray(yr) + 1j * np.asarray(yi))[0]
    xg = np.take(x[0].reshape((bi,) + rd_i), gi, axis=0)
    wg = np.take(w[0].reshape((bj,) + rd_j), gj, axis=0)
    want = np.einsum("bpqfrg,bpqrh->bhfg", xg, wg)
    err = np.abs(got.reshape(want.shape) - want).max() / np.abs(want).max()
    print(f"max rel err vs numpy: {err:.2e}")
    assert err < 1e-4


if __name__ == "__main__":
    main()
