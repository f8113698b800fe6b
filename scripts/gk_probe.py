"""Probe the compute strategies for the gather-K step kernel on the chip.

The dominant headline-scheme step form is X(2^22) x W(small) with K=8..32
contract legs scattered through X and H=4..32 fresh output legs.  Padding
makes the MXU useless below K*H ~ 10^3, so the kernel may need VPU
broadcast-FMAs.  This probe measures, on the real chip:

  stream   copy X -> Y through a trivial Pallas kernel (DMA ceiling)
  vpu      out[h,f] = sum_k w[h,k] * x[k,f] as H*K unrolled FMAs
  vpu4     same with all four re/im products (the real GK inner loop)
  mxu      one dot_general (H,K)@(K,blk) per block (padded)
  mxu-rs   same but block arrives as (2,2,2,...,blk) and is reshaped
           in VMEM (tests Mosaic sublane-relayout viability)

Usage: python scripts/gk_probe.py [K] [H]
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

R = 30
XE = 1 << 22          # X elements
import os
F_TILE = int(os.environ.get("GK_F_TILE", 2048))


def timeit(fn, *args):
    import jax
    args = jax.device_put(args)
    # block_until_ready does not truly block under the axon tunnel: force
    # a host readback after the warmup call too, or the timed call queues
    # behind the still-running compile + first execution
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.time()
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.time() - t0) / R


def scan_wrap(step):
    import jax
    import jax.numpy as jnp

    def run(*args):
        def body(c, t):
            y = step(*args, t)
            return c + y.sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(1, R + 1, dtype=jnp.float32))
        return c
    return jax.jit(run)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    FH = F_TILE // 128
    n_blocks = XE // (K * F_TILE)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((n_blocks, K, FH, 128)).astype(np.float32)
    xi = rng.standard_normal((n_blocks, K, FH, 128)).astype(np.float32)
    wr = rng.standard_normal((H, K)).astype(np.float32)
    wi = rng.standard_normal((H, K)).astype(np.float32)

    xspec = pl.BlockSpec((1, K, FH, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((H, K), lambda g: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, H, FH, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((n_blocks, H, FH, 128), jnp.float32)

    # ---- stream: out rows 0..H-1 = x rows 0..H-1 (pure DMA) -------------
    def k_stream(xr_ref, or_ref):
        for h in range(H):
            or_ref[0, h] = xr_ref[0, h % K]

    def stream(xr, t):
        return pl.pallas_call(
            k_stream, grid=(n_blocks,), in_specs=[xspec], out_specs=ospec,
            out_shape=oshape)(xr * t)
    t_stream = float("nan")

    # ---- vpu: single-component H*K FMA loop ------------------------------
    def k_vpu(xr_ref, wr_ref, or_ref):
        for h in range(H):
            acc = wr_ref[h, 0] * xr_ref[0, 0]
            for k in range(1, K):
                acc += wr_ref[h, k] * xr_ref[0, k]
            or_ref[0, h] = acc

    def vpu(xr, wr, t):
        return pl.pallas_call(
            k_vpu, grid=(n_blocks,), in_specs=[xspec, wspec],
            out_specs=ospec, out_shape=oshape)(xr * t, wr)
    t_vpu = timeit(scan_wrap(vpu), xr, wr); print("t_vpu", t_vpu, flush=True)

    # ---- vpu4: all four re/im products (two outputs) ----------------------
    def k_vpu4(xr_ref, xi_ref, wr_ref, wi_ref, or_ref, oi_ref):
        for h in range(H):
            re = wr_ref[h, 0] * xr_ref[0, 0] - wi_ref[h, 0] * xi_ref[0, 0]
            im = wi_ref[h, 0] * xr_ref[0, 0] + wr_ref[h, 0] * xi_ref[0, 0]
            for k in range(1, K):
                re += wr_ref[h, k] * xr_ref[0, k] - wi_ref[h, k] * xi_ref[0, k]
                im += wi_ref[h, k] * xr_ref[0, k] + wr_ref[h, k] * xi_ref[0, k]
            or_ref[0, h] = re
            oi_ref[0, h] = im

    def vpu4(xr, xi, wr, wi, t):
        o = pl.pallas_call(
            k_vpu4, grid=(n_blocks,),
            in_specs=[xspec, xspec, wspec, wspec],
            out_specs=(ospec, ospec), out_shape=(oshape, oshape))(
                xr * t, xi, wr, wi)
        return o[0] + o[1]
    t_vpu4 = timeit(scan_wrap(vpu4), xr, xi, wr, wi); print("t_vpu4", t_vpu4, flush=True)

    # ---- mxu: one padded dot per block -----------------------------------
    x2 = xr.reshape(n_blocks, K, F_TILE)
    x2spec = pl.BlockSpec((1, K, F_TILE), lambda g: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    o2spec = pl.BlockSpec((1, H, F_TILE), lambda g: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    o2shape = jax.ShapeDtypeStruct((n_blocks, H, F_TILE), jnp.float32)

    def k_mxu(x_ref, w_ref, o_ref):
        o_ref[0] = lax.dot_general(
            w_ref[...], x_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)

    def mxu(x2, wr, t):
        return pl.pallas_call(
            k_mxu, grid=(n_blocks,), in_specs=[x2spec, wspec],
            out_specs=o2spec, out_shape=o2shape)(x2 * t, wr)
    t_mxu = timeit(scan_wrap(mxu), x2, wr); print("t_mxu", t_mxu, flush=True)

    # ---- mxu-rs: block arrives as [2]*log2(K) x blk, reshaped in VMEM ----
    kd = int(np.log2(K))
    x3 = xr.reshape((n_blocks,) + (2,) * kd + (F_TILE,))
    x3spec = pl.BlockSpec((1,) + (2,) * kd + (F_TILE,),
                          lambda g: (g,) + (0,) * (kd + 1),
                          memory_space=pltpu.VMEM)

    def k_mxu_rs(x_ref, w_ref, o_ref):
        xv = x_ref[...].reshape(K, F_TILE)
        o_ref[0] = lax.dot_general(
            w_ref[...], xv,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)

    def mxu_rs(x3, wr, t):
        return pl.pallas_call(
            k_mxu_rs, grid=(n_blocks,), in_specs=[x3spec, wspec],
            out_specs=o2spec, out_shape=o2shape)(x3 * t, wr)
    try:
        t_mxu_rs = timeit(scan_wrap(mxu_rs), x3, wr); print("t_mxu_rs", t_mxu_rs, flush=True)
    except Exception as e:
        print(f"mxu-rs failed: {type(e).__name__}: {str(e)[:200]}")
        t_mxu_rs = float("nan")

    xb = XE * 4
    true_fl = 2 * K * H * (XE // K)
    print(f"K={K} H={H} X={XE} elems ({xb / 1e6:.0f}MB/component)")
    # the *t pre-multiply adds one read+write pass over X per iteration
    print(f"stream {t_stream * 1e3:8.3f}ms  "
          f"({(3 * xb + xb * H / K) / t_stream / 1e9:6.1f} GB/s moved)")
    print(f"vpu    {t_vpu * 1e3:8.3f}ms  ({true_fl / t_vpu / 1e12:6.2f} "
          f"TFLOP/s-true)")
    print(f"vpu4   {t_vpu4 * 1e3:8.3f}ms  ({4 * true_fl / t_vpu4 / 1e12:6.2f} "
          f"TFLOP/s-true, {(4 * xb + 2 * xb * H / K) / t_vpu4 / 1e9:6.1f} GB/s)")
    print(f"mxu    {t_mxu * 1e3:8.3f}ms  ({true_fl / t_mxu / 1e12:6.2f} "
          f"TFLOP/s-true)")
    print(f"mxu-rs {t_mxu_rs * 1e3:8.3f}ms")


if __name__ == "__main__":
    main()
