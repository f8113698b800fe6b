"""Chip microbench of RGRow kernel-body reduction variants at the
step-173 shape (F=8, K=2048, H=2, B=1000, width 8 folded into the block
windows).  The production body runs the lane-axis .sum at a measured
~25% VPU efficiency (RG_VPU_EFF); this measures whether a restructured
reduction (tile-staged adds, accumulator loop, or an MXU dot despite
the H/F pad waste) beats it.

Usage: python -u scripts/proto_rg_reduce.py [B bi bj width]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

F, K, H = 8, 2048, 2


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    args = [int(a) for a in sys.argv[1:]]
    B, bi, bj, W = (args + [1000, 251, 999, 8][len(args):])[:4]
    rng = np.random.default_rng(0)
    gi = np.sort(rng.integers(0, bi, B).astype(np.int32))
    gj = rng.integers(0, bj, B).astype(np.int32)

    def body_v0(xr, xi, whr, whi, or_ref, oi_ref, s):
        for h in range(H):
            re = (xr * whr[h] - xi * whi[h]).sum(axis=-1)
            im = (xr * whi[h] + xi * whr[h]).sum(axis=-1)
            or_ref[s, 0, h] = re
            oi_ref[s, 0, h] = im

    def body_v1(xr, xi, whr, whi, or_ref, oi_ref, s):
        kt = K // 512
        for h in range(H):
            pr = (xr * whr[h] - xi * whi[h]).reshape(F, kt, 512)
            pi = (xr * whi[h] + xi * whr[h]).reshape(F, kt, 512)
            or_ref[s, 0, h] = pr.sum(axis=1).sum(axis=-1)
            oi_ref[s, 0, h] = pi.sum(axis=1).sum(axis=-1)

    def body_v2(xr, xi, whr, whi, or_ref, oi_ref, s):
        kt = K // 512
        xr2 = xr.reshape(F, kt, 512)
        xi2 = xi.reshape(F, kt, 512)
        for h in range(H):
            wr2 = whr[h].reshape(kt, 512)
            wi2 = whi[h].reshape(kt, 512)
            ar = jnp.zeros((F, 512), jnp.float32)
            ai = jnp.zeros((F, 512), jnp.float32)
            for t in range(kt):
                ar = ar + (xr2[:, t] * wr2[t] - xi2[:, t] * wi2[t])
                ai = ai + (xr2[:, t] * wi2[t] + xi2[:, t] * wr2[t])
            or_ref[s, 0, h] = ar.sum(axis=-1)
            oi_ref[s, 0, h] = ai.sum(axis=-1)

    def body_v3(xr, xi, whr, whi, or_ref, oi_ref, s):
        # one MXU dot: [xr; xi] (2F, K) @ [wr^T | wi^T] (K, 2H)
        x2 = jnp.concatenate([xr, xi], axis=0)
        w2 = jnp.concatenate([whr, whi], axis=0).T  # (K, 2H) relayout
        a = jnp.dot(x2, w2, preferred_element_type=jnp.float32)
        re = a[:F, :H] - a[F:, H:]      # (F, H)
        im = a[:F, H:] + a[F:, :H]
        or_ref[s, 0] = re.T
        oi_ref[s, 0] = im.T

    def mk_kernel(body):
        def kern(gi_ref, gj_ref, xr_ref, xi_ref, wr_ref, wi_ref,
                 or_ref, oi_ref):
            for s in range(W):
                xr = xr_ref[s, 0]
                xi = xi_ref[s, 0]
                whr = wr_ref[s, 0]
                whi = wi_ref[s, 0]
                body(xr, xi, whr, whi, or_ref, oi_ref, s)
        return kern

    def run_variant(tag, body):
        xspec = pl.BlockSpec((W, 1, F, K),
                             lambda b, gi_ref, gj_ref: (0, gi_ref[b], 0, 0),
                             memory_space=pltpu.VMEM)
        wspec = pl.BlockSpec((W, 1, H, K),
                             lambda b, gi_ref, gj_ref: (0, gj_ref[b], 0, 0),
                             memory_space=pltpu.VMEM)
        yspec = pl.BlockSpec((W, 1, H, F),
                             lambda b, gi_ref, gj_ref: (0, b, 0, 0),
                             memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B,),
            in_specs=[xspec, xspec, wspec, wspec],
            out_specs=(yspec, yspec))
        out_shape = jax.ShapeDtypeStruct((W, B, H, F), jnp.float32)
        call = pl.pallas_call(
            mk_kernel(body), grid_spec=grid_spec,
            out_shape=(out_shape, out_shape),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))

        xr = rng.standard_normal((W, bi, F, K)).astype(np.float32)
        xi = rng.standard_normal((W, bi, F, K)).astype(np.float32)
        wr = rng.standard_normal((W, bj, H, K)).astype(np.float32)
        wi = rng.standard_normal((W, bj, H, K)).astype(np.float32)
        dev = jax.device_put
        a = [dev(v) for v in (jnp.asarray(gi), jnp.asarray(gj),
                              xr, xi, wr, wi)]

        @jax.jit
        def rep(gi_d, gj_d, xr, xi, wr, wi):
            def it(c, _):
                xr2, c2 = jax.lax.optimization_barrier((xr, c))
                yr, yi = call(gi_d, gj_d, xr2, xi, wr, wi)
                return yr[0, 0, 0, 0] * 0 + c2, None
            c, _ = jax.lax.scan(it, jnp.float32(0), None, length=8)
            return c

        try:
            jax.block_until_ready(rep(*a))
        except Exception as e:
            print(f"{tag}: FAILED {str(e)[:140]}")
            return None
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(rep(*a))
            ts.append(time.time() - t0)
        t = float(np.median(ts)) / 8 / W
        flops = 8 * B * F * K * H
        print(f"{tag}: {t*1e3:.3f} ms/slice  "
              f"({flops / (t) / 1e12:.2f} TFLOP/s eff)")

        # correctness vs numpy on slice 0
        yr, yi = jax.jit(call)(*a)
        got = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]
        x0 = (xr[0] + 1j * xi[0])[gi]
        w0 = (wr[0] + 1j * wi[0])[gj]
        want = np.einsum("bfk,bhk->bhf", x0, w0)
        err = np.abs(got - want).max() / np.abs(want).max()
        print(f"    max rel err {err:.2e}")
        return t

    for tag, body in [("v0-sum(-1)      ", body_v0),
                      ("v1-two-stage    ", body_v1),
                      ("v2-acc-loop     ", body_v2),
                      ("v3-mxu-dot      ", body_v3)]:
        run_variant(tag, body)


if __name__ == "__main__":
    main()
