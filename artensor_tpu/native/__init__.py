"""Native (C++) planner kernel: ctypes binding with on-demand compilation.

The SA search is the planner's hot loop; ``sa_kernel.cpp`` runs it on flat
arrays with all trials on C++ threads.  The shared library is built with
g++ on first use (cached next to the source; rebuilt when the source
changes) — no pybind11/pip machinery, just the platform toolchain.  When no
toolchain is available the caller falls back to the pure-Python planner.
"""

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

from ..planner import cost as _COST

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sa_kernel.cpp")
_LIB = None
_LIB_ERR = None


def _lib_path():
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_HERE, f"_sa_kernel_{digest}.so")


def _build():
    path = _lib_path()
    if os.path.exists(path):
        return path
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
    os.close(fd)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, path)
    except Exception:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise
    # clean stale builds
    for fn in os.listdir(_HERE):
        if fn.startswith("_sa_kernel_") and fn.endswith(".so") \
                and os.path.join(_HERE, fn) != path:
            try:
                os.remove(os.path.join(_HERE, fn))
            except OSError:
                pass
    return path


def load_kernel():
    """Load (building if needed) the native kernel; None if unavailable."""
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB
    try:
        lib = ctypes.CDLL(_build())
    except Exception as e:  # no toolchain / unsupported platform
        _LIB_ERR = e
        return None
    fn = lib.sa_find_order
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_int,                     # n_tensors
        np.ctypeslib.ndpointer(np.int32),   # bond_offsets
        np.ctypeslib.ndpointer(np.int32),   # bond_ids
        ctypes.c_int,                     # n_bonds
        np.ctypeslib.ndpointer(np.float64),  # bond_log2dim
        np.ctypeslib.ndpointer(np.uint8),    # is_final
        ctypes.c_double,                  # log2_max_bitstring
        ctypes.c_int,                     # trials
        np.ctypeslib.ndpointer(np.int32),    # init_orders
        ctypes.c_int,                     # iters
        ctypes.c_int,                     # n_betas
        np.ctypeslib.ndpointer(np.float64),  # betas
        ctypes.c_double,                  # sc_target
        ctypes.c_double,                  # alpha
        ctypes.c_int,                     # slicing_repeat
        ctypes.c_uint64,                  # seed
        ctypes.c_int,                     # n_threads
        np.ctypeslib.ndpointer(np.int32),    # out_order
        np.ctypeslib.ndpointer(np.int32),    # out_sliced
        np.ctypeslib.ndpointer(np.float64),  # out_stats
        ctypes.c_int,                     # objective (0 score, 1 roofline)
        ctypes.c_double,                  # roofline muladds/s
        ctypes.c_double,                  # roofline bytes/s
        ctypes.c_double,                  # roofline per-step w1 overhead s
        ctypes.c_double,                  # roofline HBM budget bytes
        ctypes.c_double,                  # roofline full-MXU K (bias knob)
    ]
    _LIB = lib
    return _LIB


def native_available():
    return load_kernel() is not None


def sa_find_order_native(tn, init_orders, sc_target, iters, betas,
                         slicing_repeat, seed, alpha=32.0, n_threads=None,
                         objective="score", k_full=None):
    """Run the native SA over an AbstractTensorNetwork.

    ``init_orders``: list (per trial) of pairwise orders over tensor ids.
    Returns (order_pairs, sliced_bond_labels, (tc, sc, mc)).
    """
    lib = load_kernel()
    assert lib is not None, "native kernel unavailable"
    tensor_ids = sorted(tn.tensor_bonds.keys())
    assert tensor_ids == list(range(len(tensor_ids))), \
        "native planner needs dense tensor ids"
    bonds = sorted(tn.bond_dims.keys(), key=str)
    bond_index = {b: k for k, b in enumerate(bonds)}
    offsets = [0]
    ids = []
    for t in tensor_ids:
        ids.extend(bond_index[b] for b in tn.tensor_bonds[t])
        offsets.append(len(ids))
    n = len(tensor_ids)
    trials = len(init_orders)
    flat_orders = np.asarray(
        [[x for pair in order for x in pair] for order in init_orders],
        dtype=np.int32)
    out_order = np.zeros((n - 1) * 2, dtype=np.int32)
    out_sliced = np.zeros(len(bonds), dtype=np.int32)
    out_stats = np.zeros(4, dtype=np.float64)
    betas = np.asarray(list(betas), dtype=np.float64)
    n_sliced = lib.sa_find_order(
        n,
        np.asarray(offsets, dtype=np.int32),
        np.asarray(ids, dtype=np.int32),
        len(bonds),
        np.asarray([np.log2(tn.bond_dims[b]) for b in bonds], dtype=np.float64),
        np.asarray([1 if t in tn.final_qubits else 0 for t in tensor_ids],
                   dtype=np.uint8),
        float(tn.log2_max_bitstring),
        trials,
        np.ascontiguousarray(flat_orders),
        int(iters),
        len(betas),
        betas,
        float(sc_target),
        float(alpha),
        int(slicing_repeat),
        int(seed),
        int(n_threads if n_threads else (os.cpu_count() or 1)),
        out_order,
        out_sliced,
        out_stats,
        1 if objective == "roofline" else 0,
        float(_COST.TPU_COMPLEX_MULADD_PER_S),
        float(_COST.TPU_HBM_BYTES_PER_S),
        float(_COST.STEP_OVERHEAD_W1_S),
        float(_COST.HBM_BUDGET_BYTES),
        float(k_full if k_full else _COST.MXU_K_FULL),
    )
    assert n_sliced >= 0, "native SA failed"
    order = [(int(out_order[2 * p]), int(out_order[2 * p + 1]))
             for p in range(n - 1)]
    sliced = [bonds[out_sliced[s]] for s in range(n_sliced)]
    return order, sliced, tuple(out_stats[:3])
