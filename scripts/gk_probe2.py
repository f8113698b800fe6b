"""Isolate the GK kernel's own throughput: self-feeding chain y = f(y).

With K == H the kernel's output shape equals its input shape, so R chained
applications time the kernel alone (no premultiply, no reduction, no DCE
risk — every iteration consumes the previous output).

Usage: python scripts/gk_probe2.py [K=8] [F_TILE=2048] [mode=vpu4|copy|xla]
"""

import sys
import time

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

R = 30
XE = 1 << 22


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    FT = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    mode = sys.argv[3] if len(sys.argv) > 3 else "vpu4"
    H = K
    FH = FT // 128
    nb = XE // (K * FT)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((nb, K, FH, 128)).astype(np.float32) * 0.1
    xi = rng.standard_normal((nb, K, FH, 128)).astype(np.float32) * 0.1
    wr = (rng.standard_normal((H, K)).astype(np.float32) / K)
    wi = (rng.standard_normal((H, K)).astype(np.float32) / K)

    xspec = pl.BlockSpec((1, K, FH, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((H, K), lambda g: (0, 0), memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((nb, H, FH, 128), jnp.float32)

    def k_vpu4(xr_ref, xi_ref, wr_ref, wi_ref, or_ref, oi_ref):
        for h in range(H):
            re = wr_ref[h, 0] * xr_ref[0, 0] - wi_ref[h, 0] * xi_ref[0, 0]
            im = wi_ref[h, 0] * xr_ref[0, 0] + wr_ref[h, 0] * xi_ref[0, 0]
            for k in range(1, K):
                re += wr_ref[h, k] * xr_ref[0, k] - wi_ref[h, k] * xi_ref[0, k]
                im += wi_ref[h, k] * xr_ref[0, k] + wr_ref[h, k] * xi_ref[0, k]
            or_ref[0, h] = re
            oi_ref[0, h] = im

    def k_copy(xr_ref, xi_ref, wr_ref, wi_ref, or_ref, oi_ref):
        or_ref[...] = xr_ref[...]
        oi_ref[...] = xi_ref[...]

    kern = {"vpu4": k_vpu4, "copy": k_copy}.get(mode)

    if mode == "xla":
        def one(xr, xi, wr, wi):
            a = jnp.einsum("bkf,hk->bhf", xr.reshape(nb, K, FT), wr)
            b = jnp.einsum("bkf,hk->bhf", xi.reshape(nb, K, FT), wi)
            c = jnp.einsum("bkf,hk->bhf", xr.reshape(nb, K, FT), wi)
            d = jnp.einsum("bkf,hk->bhf", xi.reshape(nb, K, FT), wr)
            return ((a - b).reshape(nb, H, FH, 128),
                    (c + d).reshape(nb, H, FH, 128))
    else:
        def one(xr, xi, wr, wi):
            return pl.pallas_call(
                kern, grid=(nb,),
                in_specs=[xspec, xspec, wspec, wspec],
                out_specs=(pl.BlockSpec((1, H, FH, 128),
                                        lambda g: (g, 0, 0, 0),
                                        memory_space=pltpu.VMEM),) * 2,
                out_shape=(oshape, oshape),
            )(xr, xi, wr, wi)

    @jax.jit
    def chain(xr, xi, wr, wi):
        def body(c, _):
            return one(c[0], c[1], wr, wi), None
        (yr, yi), _ = jax.lax.scan(body, (xr, xi), None, length=R)
        return yr[0, 0, 0, 0] + yi[0, 0, 0, 0]

    args = jax.device_put((xr, xi, wr, wi))
    # NOTE: block_until_ready does NOT block under the axon tunnel — a
    # host readback is the only real synchronization point
    _ = float(chain(*args))
    t0 = time.time()
    _ = float(chain(*args))
    per = (time.time() - t0) / R
    gb = 4 * XE * 4 / 1e9          # read 2 + write 2 components
    fl = 8 * K * H * (XE // K)
    print(f"mode={mode} K=H={K} FT={FT} nb={nb}: {per * 1e3:.3f} ms/iter  "
          f"{gb / per:.0f} GB/s  {fl / per / 1e12:.2f} TFLOP/s-true")


if __name__ == "__main__":
    main()
