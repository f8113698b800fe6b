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
    """Complex tensors as (re, im) pairs of real device arrays."""

    def __init__(self, dtype=np.complex64, precision="highest", algo="naive"):
        self.dtype = np.dtype(dtype)
        self.rdtype = _real_dtype(dtype)
        self.precision = PRECISIONS.get(precision, precision)
        self.algo = algo

    # -- staging ----------------------------------------------------------
    def wrap(self, arr):
        arr = np.asarray(arr).astype(self.dtype)
        return (jnp.asarray(arr.real.astype(self.rdtype)),
                jnp.asarray(arr.imag.astype(self.rdtype)))

    def unwrap(self, x):
        re, im = x
        return np.asarray(re) + 1j * np.asarray(im)

    # -- arithmetic -------------------------------------------------------
    def einsum(self, a, b, ix_a, ix_b, iy):
        ar, ai = a
        br, bi = b
        es = lambda x, y: jnp.einsum(
            x, list(ix_a), y, list(ix_b), list(iy), precision=self.precision)
        if self.algo == "naive":
            return es(ar, br) - es(ai, bi), es(ar, bi) + es(ai, br)
        t1 = es(ar, br)
        t2 = es(ai, bi)
        t3 = es(ar + ai, br + bi)
        return t1 - t2, t3 - t1 - t2

    def add(self, x, y):
        return x[0] + y[0], x[1] + y[1]

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
            return mm(ar, br) - mm(ai, bi), mm(ar, bi) + mm(ai, br)
        t1 = mm(ar, br)
        t2 = mm(ai, bi)
        t3 = mm(ar + ai, br + bi)
        return t1 - t2, t3 - t1 - t2

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
               algo="naive"):
    """'split' (TPU-native, default) or 'complex' (CPU reference path).

    ``algo``: complex-product decomposition for split mode — 'naive'
    (4 matmuls, default: measured faster on the memory-bound contraction
    workloads despite 33% more MXU flops) or 'karatsuba' (3 matmuls + extra
    elementwise passes; wins only when genuinely FLOP-bound).
    """
    cls = SplitField if mode == "split" else ComplexField
    return cls(dtype, precision, algo)
