"""Number-field abstraction: native-complex vs split real/imag execution.

The TPU has no complex datatype: the MXU multiplies real (bf16-pass) tiles
only, and this environment's TPU backend rejects complex64 outright.  The
TPU-native representation of a complex tensor is therefore a PAIR of real
arrays (re, im); a complex contraction becomes

  naive      4 real einsums:  re = ar.br - ai.bi,  im = ar.bi + ai.br
  karatsuba  3 real einsums:  t1 = ar.br, t2 = ai.bi, t3 = (ar+ai).(br+bi)
             re = t1 - t2,    im = t3 - t1 - t2        (25% fewer MXU FLOPs)

Executors are written against the Field interface so the same scheme runs
with either representation (SplitField is the default everywhere; it is the
only one that runs on this TPU, and on CPU it doubles as a cross-check
against ComplexField).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .einsum import PRECISIONS


def _real_dtype(dtype):
    return {np.dtype(np.complex64): jnp.float32,
            np.dtype(np.complex128): jnp.float64}[np.dtype(dtype)]


class SplitField:
    """Complex tensors as (re, im) pairs of real device arrays.

    ``storage``: dtype intermediates are stored in between steps.  'f32'
    (default) keeps full single precision; 'bf16' halves HBM traffic on the
    memory-bound contraction steps (dots still accumulate in f32 via
    preferred_element_type; only the stored values round to bf16).  The
    accumulator for slice sums always stays f32.
    """

    def __init__(self, dtype=np.complex64, precision="highest", algo="naive",
                 storage="f32"):
        self.dtype = np.dtype(dtype)
        self.rdtype = _real_dtype(dtype)
        self.precision = PRECISIONS.get(precision, precision)
        self.algo = algo
        self.storage = storage
        self.sdtype = {"bf16": jnp.bfloat16, "f16": jnp.float16}.get(
            storage, self.rdtype)
        # eligible steps run the Pallas lane kernel (f32/c64 path only)
        self.supports_lanes = (storage == "f32"
                               and self.rdtype == jnp.float32)

    def _store(self, x):
        return x if self.sdtype == self.rdtype else x.astype(self.sdtype)

    # -- staging ----------------------------------------------------------
    def wrap(self, arr):
        arr = np.asarray(arr).astype(self.dtype)
        return (jnp.asarray(arr.real.astype(self.rdtype)).astype(self.sdtype),
                jnp.asarray(arr.imag.astype(self.rdtype)).astype(self.sdtype))

    def unwrap(self, x):
        re, im = x
        return (np.asarray(re.astype(self.rdtype))
                + 1j * np.asarray(im.astype(self.rdtype)))

    # -- arithmetic -------------------------------------------------------
    def einsum(self, a, b, ix_a, ix_b, iy):
        ar, ai = a
        br, bi = b
        es = lambda x, y: jnp.einsum(
            x, list(ix_a), y, list(ix_b), list(iy), precision=self.precision,
            preferred_element_type=self.rdtype)
        if self.algo == "naive":
            return (self._store(es(ar, br) - es(ai, bi)),
                    self._store(es(ar, bi) + es(ai, br)))
        t1 = es(ar, br)
        t2 = es(ai, bi)
        t3 = es(ar + ai, br + bi)
        return self._store(t1 - t2), self._store(t3 - t1 - t2)

    def add(self, x, y):
        return x[0] + y[0], x[1] + y[1]

    def sum0(self, x):
        """Sum over the leading axis, accumulating in full precision."""
        return tuple(c.sum(0, dtype=self.rdtype) for c in x)

    def zeros(self, shape):
        z = jnp.zeros(shape, dtype=self.rdtype)
        return z, z

    def max_abs(self, x):
        # max(|re|, |im|) is within sqrt(2) of the true complex magnitude —
        # plenty for overflow-protection rescaling
        return jnp.maximum(jnp.max(jnp.abs(x[0])), jnp.max(jnp.abs(x[1])))

    def scale(self, x, s):
        return x[0] * s, x[1] * s

    def matmul(self, a, b):
        """Batched matmul on (B, M, K) x (B, K, N) physical operands."""
        return self.dot(a, b, (((2,), (1,)), ((0,), (0,))))

    def dot(self, a, b, dnums):
        """General dot_general (multi-dim batch/contract) on split pairs."""
        ar, ai = a
        br, bi = b
        mm = lambda x, y: lax.dot_general(
            x, y, dnums, precision=self.precision,
            preferred_element_type=self.rdtype)
        if self.algo == "naive":
            return (self._store(mm(ar, br) - mm(ai, bi)),
                    self._store(mm(ar, bi) + mm(ai, br)))
        t1 = mm(ar, br)
        t2 = mm(ai, bi)
        t3 = mm(ar + ai, br + bi)
        return self._store(t1 - t2), self._store(t3 - t1 - t2)

    # -- structural ops ---------------------------------------------------
    def regroup(self, x, dims, perm, final_shape):
        """reshape(dims) -> transpose(perm) -> reshape(final_shape).

        The high-rank logical view exists only transiently; XLA lowers this
        chain to one copy between flat layouts.
        """
        identity = perm == tuple(range(len(perm)))

        def one(c):
            c = c.reshape(dims)
            if not identity:
                c = c.transpose(perm)
            return c.reshape(final_shape)

        return tuple(one(c) for c in x)

    def index_logical(self, x, dims, axis, idx, out_shape):
        """Select index ``idx`` of logical ``axis`` on flat-stored ``x``."""
        def one(c):
            c = lax.dynamic_index_in_dim(
                c.reshape(dims), idx, axis=axis, keepdims=False)
            return c.reshape(out_shape)

        return tuple(one(c) for c in x)

    def index(self, x, idx, axis):
        return tuple(lax.dynamic_index_in_dim(c, idx, axis=axis, keepdims=False)
                     for c in x)

    def take(self, x, indices, axis=0):
        indices = jnp.asarray(indices)
        return tuple(jnp.take(c, indices, axis=axis) for c in x)

    def reshape(self, x, shape):
        return tuple(c.reshape(shape) for c in x)

    def concat(self, parts, axis=0):
        return (jnp.concatenate([p[0] for p in parts], axis=axis),
                jnp.concatenate([p[1] for p in parts], axis=axis))

    def transpose(self, x, perm):
        return tuple(c.transpose(perm) for c in x)

    def psum(self, x, axis_name):
        return tuple(lax.psum(c, axis_name) for c in x)

    def pvary(self, x, axis_name):
        return tuple(lax.pvary(c, (axis_name,)) for c in x)


# real 2x2x2 representation of complex multiplication:
# out_c = sum_{p,q} R[c,p,q] * A_p * B_q
_R = np.zeros((2, 2, 2), dtype=np.float32)
_R[0, 0, 0] = 1.0   # re: ar*br
_R[0, 1, 1] = -1.0  # re: -ai*bi
_R[1, 0, 1] = 1.0   # im: ar*bi
_R[1, 1, 0] = 1.0   # im: ai*br


class FusedField:
    """Complex tensors as ONE real array with a trailing re/im axis (dim 2)
    folded into the flat minor dim (c varies fastest).

    A contraction step runs as a SINGLE real dot_general: the smaller
    operand is expanded at trace time into W4[..., p, c] = R[c,p,q].W[..., q]
    and p is contracted together with the bond dims (runtime/lowering.py
    FusedPlan).  Compared with the split-pair 4-dot chain this reads the
    large operand once instead of twice — measured 1.5x on the dominant
    memory-bound steps of the Sycamore n30 workload, at identical f32
    accumulation (the four products sum inside one dot).

    All structural methods take the same c-free logical/physical shapes as
    SplitField and fold the implicit trailing c axis internally.
    """

    mode = "fused"

    def __init__(self, dtype=np.complex64, precision="highest", algo="naive",
                 storage="f32"):
        self.dtype = np.dtype(dtype)
        self.rdtype = _real_dtype(dtype)
        self.precision = PRECISIONS.get(precision, precision)
        self.algo = algo
        self.storage = storage
        self.sdtype = {"bf16": jnp.bfloat16, "f16": jnp.float16}.get(
            storage, self.rdtype)

    def _store(self, x):
        return x if self.sdtype == self.rdtype else x.astype(self.sdtype)

    @staticmethod
    def _fold(shape):
        shape = tuple(int(s) for s in shape)
        if not shape:
            return (2,)
        return shape[:-1] + (shape[-1] * 2,)

    # -- staging ----------------------------------------------------------
    def wrap(self, arr):
        arr = np.asarray(arr).astype(self.dtype)
        stacked = np.stack([arr.real.astype(np.float32 if self.rdtype == jnp.float32
                                            else np.float64),
                            arr.imag.astype(np.float32 if self.rdtype == jnp.float32
                                            else np.float64)], axis=-1)
        return jnp.asarray(stacked.reshape(self._fold(arr.shape))).astype(self.sdtype)

    def unwrap(self, x):
        a = np.asarray(x.astype(self.rdtype))
        a = a.reshape(a.shape[:-1] + (a.shape[-1] // 2, 2))
        return (a[..., 0] + 1j * a[..., 1])

    # -- the contraction step ---------------------------------------------
    # NOTE on layouts: any materialized array whose MINOR dim is tiny (2/4)
    # gets padded to the 128-lane tile by XLA — measured 32-64x HBM blowups.
    # Every interleave/deinterleave below is therefore expressed as a gather
    # along an already-large flat minor dim (indices are iota arithmetic),
    # which materializes only well-shaped buffers.

    def _unfold_pair(self, x):
        R = x.shape[-1] // 2
        idx = jnp.arange(R, dtype=jnp.int32) * 2
        return (jnp.take(x, idx, axis=-1), jnp.take(x, idx + 1, axis=-1))

    def _interleave(self, re, im):
        R = re.shape[-1]
        t = jnp.arange(2 * R, dtype=jnp.int32)
        re2 = jnp.take(re, t // 2, axis=-1)
        im2 = jnp.take(im, t // 2, axis=-1)
        return jnp.where(t % 2 == 0, re2, im2)

    def _expand_w4_flat(self, w_flat):
        """Folded W (..., 2L) -> folded W4 (..., 4L): per element the quad
        [wr, wi, -wi, wr] (labels (..., p, c) with c fastest)."""
        L4 = w_flat.shape[-1] * 2
        t = jnp.arange(L4, dtype=jnp.int32)
        j = t % 4
        src = (t // 4) * 2 + ((j == 1) | (j == 2)).astype(jnp.int32)
        sign = jnp.where(j == 2, -1.0, 1.0).astype(self.rdtype)
        return jnp.take(w_flat, src, axis=-1).astype(self.rdtype) * sign

    def contract_step(self, x, y, low):
        """One lowered step on folded-stacked arrays (traceable)."""
        from ..runtime.lowering import _element_indices, apply_lowered

        plan = low.fused
        if plan is None:
            # large-W fallback: unstack both operands and run the split
            # 4-dot path, restacking the result (rare: only steps where
            # both operands exceed FUSED_W_MAX_ELEMS)
            xp, yp = self._unfold_pair(x), self._unfold_pair(y)
            helper = SplitField(self.dtype, self.precision, self.algo,
                                self.storage)
            re, im = apply_lowered(helper, xp, yp, low)
            return self._interleave(re, im)
        d, w = (x, y) if plan.w_is_j else (y, x)
        # expand W -> W4[..., p, c] along the flat minor dim (W small)
        w4 = self._expand_w4_flat(w.reshape((-1,))).astype(d.dtype)
        dg = d.reshape(plan.shape_d)
        wg = w4.reshape(plan.shape_w)
        l, r = (wg, dg) if plan.w4_lhs else (dg, wg)
        out = lax.dot_general(l, r, plan.dnums, precision=self.precision,
                              preferred_element_type=self.rdtype)
        if plan.re_out is not None:
            ro = plan.re_out
            if ro.mode == "transpose":
                out = out.reshape(ro.dims).transpose(ro.perm)
            elif ro.perm[-1] == len(ro.dims) - 1 and len(ro.dims) > 1:
                rows = int(np.prod(ro.dims[:-1]))
                idx = _element_indices(ro.dims[:-1], ro.perm[:-1])
                out = jnp.take(out.reshape((rows, ro.dims[-1])), idx, axis=0)
            else:
                idx = _element_indices(ro.dims, ro.perm)
                out = jnp.take(out.reshape((idx.shape[0],)), idx, axis=0)
            return self._store(out.reshape(ro.final_shape))
        return self._store(out.reshape(plan.phys_y))

    def einsum(self, a, b, ix_a, ix_b, iy):
        """Label einsum on folded arrays (fallback path; single dot)."""
        lab = {}
        for l in (*ix_a, *ix_b, *iy):
            lab.setdefault(l, len(lab))
        n = len(lab)
        q, p, c = n, n + 1, n + 2
        # logical views with trailing re/im axis
        av = a.reshape(a.shape[:-1] + (a.shape[-1] // 2, 2))
        bv = b.reshape(b.shape[:-1] + (b.shape[-1] // 2, 2))
        out = jnp.einsum(
            jnp.asarray(_R, dtype=self.rdtype), [c, p, q],
            av.astype(self.rdtype), [*(lab[l] for l in ix_a), p],
            bv.astype(self.rdtype), [*(lab[l] for l in ix_b), q],
            [*(lab[l] for l in iy), c], precision=self.precision)
        return self._store(out.reshape(self._fold(out.shape[:-1])))

    # -- arithmetic / structure -------------------------------------------
    def add(self, x, y):
        return x + y

    def sum0(self, x):
        return x.sum(0, dtype=self.rdtype)

    def zeros(self, shape):
        return jnp.zeros(self._fold(shape), dtype=self.rdtype)

    def max_abs(self, x):
        return jnp.max(jnp.abs(x))

    def scale(self, x, s):
        return x * s

    def regroup(self, x, dims, perm, final_shape):
        """c-free logical regroup; the trailing c axis rides along."""
        v = x.reshape(tuple(dims) + (2,))
        if perm != tuple(range(len(perm))):
            v = v.transpose(tuple(perm) + (len(dims),))
        return v.reshape(self._fold(final_shape))

    def index_logical(self, x, dims, axis, idx, out_shape):
        dims = tuple(dims)
        if axis < len(dims) - 1:
            # index on the FOLDED view (last logical dim carries c):
            # avoids materializing a minor-dim-2 slice
            v = lax.dynamic_index_in_dim(
                x.reshape(dims[:-1] + (dims[-1] * 2,)), idx,
                axis=axis, keepdims=False)
        else:
            v = lax.dynamic_index_in_dim(
                x.reshape(dims + (2,)), idx, axis=axis, keepdims=False)
        return v.reshape(self._fold(out_shape))

    def index(self, x, idx, axis):
        return lax.dynamic_index_in_dim(x, idx, axis=axis, keepdims=False)

    def take(self, x, indices, axis=0):
        indices = jnp.asarray(indices)
        if x.ndim >= 2 and axis < x.ndim - 1:
            # the folded c lives in the last storage dim; other axes map 1:1
            return jnp.take(x, indices, axis=axis)
        # rank-1 storage (B*2,): gather row pairs along the flat minor dim
        assert axis == 0
        t = jnp.arange(indices.shape[0] * 2, dtype=jnp.int32)
        src = jnp.take(indices, t // 2) * 2 + t % 2
        return jnp.take(x, src, axis=-1)

    def reshape(self, x, shape):
        return x.reshape(self._fold(shape))

    def concat(self, parts, axis=0):
        return jnp.concatenate(parts, axis=axis)

    def psum(self, x, axis_name):
        return lax.psum(x, axis_name)

    def pvary(self, x, axis_name):
        return lax.pvary(x, (axis_name,))


class ComplexField:
    """Native complex dtype (CPU/GPU reference path; unsupported on this TPU)."""

    def __init__(self, dtype=np.complex64, precision="highest", algo=None):
        self.dtype = np.dtype(dtype)
        self.precision = PRECISIONS.get(precision, precision)

    def wrap(self, arr):
        return jnp.asarray(np.asarray(arr).astype(self.dtype))

    def unwrap(self, x):
        return np.asarray(x)

    def einsum(self, a, b, ix_a, ix_b, iy):
        return jnp.einsum(a, list(ix_a), b, list(ix_b), list(iy),
                          precision=self.precision)

    def add(self, x, y):
        return x + y

    def sum0(self, x):
        return x.sum(0)

    def zeros(self, shape):
        return jnp.zeros(shape, dtype=self.dtype)

    def max_abs(self, x):
        return jnp.max(jnp.abs(x))

    def scale(self, x, s):
        return x * s

    def matmul(self, a, b):
        return self.dot(a, b, (((2,), (1,)), ((0,), (0,))))

    def dot(self, a, b, dnums):
        return lax.dot_general(a, b, dnums, precision=self.precision,
                               preferred_element_type=self.dtype)

    def regroup(self, x, dims, perm, final_shape):
        x = x.reshape(dims)
        if perm != tuple(range(len(perm))):
            x = x.transpose(perm)
        return x.reshape(final_shape)

    def index_logical(self, x, dims, axis, idx, out_shape):
        x = lax.dynamic_index_in_dim(
            x.reshape(dims), idx, axis=axis, keepdims=False)
        return x.reshape(out_shape)

    def index(self, x, idx, axis):
        return lax.dynamic_index_in_dim(x, idx, axis=axis, keepdims=False)

    def take(self, x, indices, axis=0):
        return jnp.take(x, jnp.asarray(indices), axis=axis)

    def reshape(self, x, shape):
        return x.reshape(shape)

    def concat(self, parts, axis=0):
        return jnp.concatenate(parts, axis=axis)

    def transpose(self, x, perm):
        return x.transpose(perm)

    def psum(self, x, axis_name):
        return lax.psum(x, axis_name)

    def pvary(self, x, axis_name):
        return lax.pvary(x, (axis_name,))


def make_field(dtype=np.complex64, precision="highest", mode="split",
               algo="naive", storage="f32"):
    """'split' (TPU-native, default) or 'complex' (CPU reference path).

    ``algo``: complex-product decomposition for split mode — 'naive'
    (4 matmuls, default: measured faster on the memory-bound contraction
    workloads despite 33% more MXU flops) or 'karatsuba' (3 matmuls + extra
    elementwise passes; wins only when genuinely FLOP-bound).

    ``storage``: 'f32' (default), 'bf16' or 'f16' — reduced-precision
    intermediate storage (half the HBM traffic, the binding resource);
    dots still accumulate f32.  Split/fused modes only.  NOTE: on deep
    contractions the per-step storage rounding is amplified by path
    cancellation — bf16/f16 storage fails the n30 5%-relative-error gate
    and is offered as an explicitly-requested fast mode only.

    'fused' executes each complex contraction as ONE real dot_general
    (see FusedField) — the fastest mode on TPU at full f32 accuracy.
    """
    if mode == "split":
        return SplitField(dtype, precision, algo, storage)
    if mode == "fused":
        return FusedField(dtype, precision, algo, storage)
    return ComplexField(dtype, precision, algo)
