"""Compile a contraction tree into a static execution scheme.

A scheme is a plain-Python list of step descriptors — fully determined at
compile (host) time, so the executors trace once under ``jax.jit`` with
every shape, axis order, and gather index static.  This mirrors the
reference's design split (compile: /root/reference/artensor/
contraction.py:23-59, 208-341) while emitting integer-sublist einsum labels
instead of capped letter equations.

Dense step:   DenseStep(i, j, ix_i, ix_j, iy)
  contract buffer j into buffer i; ix/iy are per-step integer label lists.
"""

from dataclasses import dataclass


@dataclass(frozen=True)
class DenseStep:
    i: int
    j: int
    ix_i: tuple
    ix_j: tuple
    iy: tuple


def _relabel(ix_i, ix_j, iy):
    """Map arbitrary bond labels of one step to dense ints."""
    lab = {}
    for b in [*ix_i, *ix_j, *iy]:
        lab.setdefault(b, len(lab))
    return (
        tuple(lab[b] for b in ix_i),
        tuple(lab[b] for b in ix_j),
        tuple(lab[b] for b in iy),
    )


def internal_nodes_in_execution_order(ctree):
    """Internal vertices ordered leaves->root following the DFS convention
    (larger-sc child first) used for buffer-reuse-friendly emission."""
    ctree.mark_representatives()
    out = []
    stack = [ctree.root]
    while stack:
        v = stack.pop()
        if v.is_leaf():
            continue
        out.append(v)
        if v.left.sc > v.right.sc:
            stack += [v.left, v.right]
        else:
            stack += [v.right, v.left]
    out.reverse()
    return out


def contraction_scheme(ctree):
    """Dense (full-amplitude) scheme.

    Returns ``(steps, output_bonds)``: the steps list and the bond labels of
    the final result tensor (open legs), in the axis order the executor will
    produce.
    """
    tn = ctree.tn
    bond_order = {}  # id(node) -> tuple of bond labels of its result axes
    steps = []
    output_bonds = ()
    for v in internal_nodes_in_execution_order(ctree):
        for child in (v.left, v.right):
            if child.is_leaf():
                bond_order[id(child)] = tuple(tn.tensor_bonds[child.leaf_id])
        ix_left = bond_order[id(v.left)]
        ix_right = bond_order[id(v.right)]
        iy = tuple(v.boundary.keys())
        bond_order[id(v)] = iy
        if v.rep == v.left.rep:
            i, j = v.left.rep, v.right.rep
            ix_i, ix_j = ix_left, ix_right
        else:
            i, j = v.right.rep, v.left.rep
            ix_i, ix_j = ix_right, ix_left
        steps.append(DenseStep(i, j, *_relabel(ix_i, ix_j, iy)))
        if v is ctree.root:
            output_bonds = iy
    return steps, list(output_bonds)
