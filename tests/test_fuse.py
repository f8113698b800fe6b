"""Small-operand reassociation (runtime/fuse.py): numeric exactness on
randomized carrier-chain networks, determinism, and arbiter semantics."""

import numpy as np
import pytest

from artensor_tpu.runtime.fuse import reassociate_small_chains


def _contract(order, tensor_bonds, tensors, labels):
    """Reference executor with the compiler's merge rule (result at the
    pair's first id; common bonds contracted unless a third live tensor
    still holds them)."""
    work = {t: tensors[t] for t in tensor_bonds}
    bonds = {t: list(bs) for t, bs in tensor_bonds.items()}
    for i, j in order:
        bi, bj = bonds[i], bonds[j]
        common = set(bi) & set(bj)
        still = {b for b in common
                 if any(b in bonds[t2] for t2 in bonds
                        if t2 not in (i, j) and bonds[t2])}
        out = [b for b in bi if b not in common or b in still]
        out += [b for b in bj if (b not in common or b in still)
                and b not in out]
        work[i] = np.einsum(work[i], [labels[b] for b in bi],
                            work[j], [labels[b] for b in bj],
                            [labels[b] for b in out])
        work[j] = None
        bonds[i], bonds[j] = out, []
    ri = order[-1][0]
    return work[ri], bonds[ri]


def _chain_tn(seed, n_carrier_legs=16, n_gates=7):
    """A big carrier plus a chain of small gate-block tensors, each
    taking a few live legs and emitting fresh ones."""
    rng = np.random.default_rng(seed)
    x_legs = [f"x{k}" for k in range(n_carrier_legs)]
    tensor_bonds = {0: list(x_legs)}
    bond_dims = {b: 2.0 for b in x_legs}
    tid = 1
    avail = list(x_legs)
    for g in range(n_gates):
        take = [avail.pop(rng.integers(len(avail)))
                for _ in range(int(rng.integers(1, 4)))]
        fresh = [f"g{g}_{k}" for k in range(int(rng.integers(1, 4)))]
        for b in fresh:
            bond_dims[b] = 2.0
        tensor_bonds[tid] = take + fresh
        avail += fresh
        tid += 1
    tensors = {t: (rng.normal(size=tuple(int(bond_dims[b]) for b in bs))
                   + 1j * rng.normal(size=tuple(int(bond_dims[b])
                                                for b in bs)))
               for t, bs in tensor_bonds.items()}
    order = [(0, t) for t in range(1, tid)]
    return order, tensor_bonds, bond_dims, tensors


@pytest.mark.parametrize("seed", range(10))
def test_reassociation_is_exact(seed):
    order, tb, bd, tensors = _chain_tn(seed)
    labels = {b: k for k, b in enumerate(bd)}
    new_order = reassociate_small_chains(order, tb, bd)
    want, wb = _contract(order, tb, tensors, labels)
    got, gb = _contract(new_order, tb, tensors, labels)
    got = np.transpose(got, [gb.index(b) for b in wb]) if wb else got
    assert np.allclose(want, got, rtol=1e-11)
    # final result id unchanged (downstream indexing relies on it)
    assert new_order[-1][0] == order[-1][0]


def test_reassociation_reduces_carrier_sweeps():
    """Across the seeds, the pass must actually collapse chains (the
    whole point) — total carrier sweeps drop substantially."""
    tot_old = tot_new = 0
    for seed in range(10):
        order, tb, bd, _ = _chain_tn(seed)
        new_order = reassociate_small_chains(order, tb, bd)
        tot_old += sum(1 for p in order if 0 in p)
        tot_new += sum(1 for p in new_order if 0 in p)
    assert tot_new < 0.7 * tot_old


def test_reassociation_deterministic():
    order, tb, bd, _ = _chain_tn(3)
    a = reassociate_small_chains(order, tb, bd)
    b = reassociate_small_chains(order, tb, bd)
    assert a == b


def test_accept_arbiter_vetoes():
    order, tb, bd, _ = _chain_tn(1)
    vetoed = reassociate_small_chains(order, tb, bd,
                                      accept=lambda cand: False)
    assert vetoed == [tuple(p) for p in order]
    seen = []
    kept = reassociate_small_chains(order, tb, bd,
                                    accept=lambda c: seen.append(1) or True)
    assert seen and kept != [tuple(p) for p in order]
