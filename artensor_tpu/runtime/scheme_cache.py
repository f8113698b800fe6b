"""Persistent scheme cache: negotiation + fusion arbitration cost
20-40 s of host time per compile; their output is a pure function of
(plan, bitstrings, sc_target, compiler code), so warm processes can
load the pickled steps instead.

The key hashes the COMPILER SOURCE FILES along with the inputs — any
edit to the scheme pipeline invalidates the cache automatically, so a
stale scheme can never outlive the code that built it.
"""

import hashlib
import os
import pickle

_SRC_MODULES = ("sparse", "scheme", "fuse", "negotiate", "lanes",
                "gatherk", "lowering", "metrics")
_code_hash = None


def _compiler_hash():
    global _code_hash
    if _code_hash is None:
        h = hashlib.sha256()
        base = os.path.dirname(os.path.abspath(__file__))
        for m in _SRC_MODULES:
            with open(os.path.join(base, m + ".py"), "rb") as f:
                h.update(f.read())
        _code_hash = h.hexdigest()[:16]
    return _code_hash


def cache_dir():
    d = os.environ.get("ARTENSOR_TPU_SCHEME_CACHE")
    if d is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        d = os.path.join(root, ".scheme_cache")
    os.makedirs(d, exist_ok=True)
    return d


def _key(plan_path, bitstrings, sc_target, extra=()):
    h = hashlib.sha256()
    with open(plan_path, "rb") as f:
        h.update(f.read())
    h.update(repr(sorted(bitstrings)).encode())
    h.update(repr((float(sc_target), tuple(extra))).encode())
    h.update(_compiler_hash().encode())
    return h.hexdigest()[:32]


def cached_scheme_sparse(plan_path, ctree, bitstrings, sc_target,
                         **kwargs):
    """contraction_scheme_sparse with a pickle cache keyed on the plan
    file, the bitstring set, sc_target, kwargs, and the compiler code."""
    from .sparse import contraction_scheme_sparse

    key = _key(plan_path, bitstrings, sc_target,
               extra=sorted(kwargs.items()))
    path = os.path.join(cache_dir(), f"sparse_{key}.pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                return pickle.load(f)
        except Exception:
            pass                         # corrupt/incompatible: rebuild
    out = contraction_scheme_sparse(ctree, bitstrings,
                                    sc_target=sc_target, **kwargs)
    tmp = path + f".tmp{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            pickle.dump(out, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    except Exception:
        if os.path.exists(tmp):
            os.remove(tmp)
    return out
