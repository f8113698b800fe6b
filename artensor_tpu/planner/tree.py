"""Binary contraction tree with incrementally-maintained cost caches.

Differences from the reference design (/root/reference/artensor/
contraction_tree.py) — same observable semantics, TPU-planner-friendly
internals:

  * Nodes hold parent/child pointers; no dict keyed by frozensets of
    contained tensors, so structural edits are O(1) pointer surgery.
  * Each node caches a bond->refcount ``boundary`` map instead of the full
    contained-tensor set; "is this bond fully inside?" becomes a counter
    comparison instead of an O(n) subset test.
  * All traversals are iterative (the reference needs
    sys.setrecursionlimit(16385) for big circuits, order_finder.py:189).
  * Snapshots are (order, sliced-bonds) pairs rather than deepcopies; a tree
    rebuild from a snapshot costs the same as one construction pass.
"""

from math import log2

from ..utils import log10sumexp2, log2sumexp2
from .cost import leaf_cost, merge_cost


class Node:
    __slots__ = (
        "left", "right", "parent", "leaf_id", "rep",
        "tc", "sc", "mc", "mfactor", "boundary", "contract_bonds",
    )

    def __init__(self):
        self.left = None
        self.right = None
        self.parent = None
        self.leaf_id = None    # tensor id for leaves, None for internal nodes
        self.rep = -1          # representative tensor id (scheme emission)

    def is_leaf(self):
        return self.leaf_id is not None

    def refresh(self, tn):
        """Recompute cached costs from the network (leaf) or children."""
        if self.is_leaf():
            self.tc, self.sc, self.mfactor = leaf_cost(tn, self.leaf_id)
            self.boundary = {b: 1 for b in tn.tensor_bonds[self.leaf_id]}
            self.contract_bonds = set()
        else:
            (self.tc, self.sc, self.mfactor, self.boundary, self.mc,
             self.contract_bonds, _) = merge_cost(tn, self.left, self.right)

    def has_bond(self, bond):
        return bond in self.boundary or bond in self.contract_bonds


class ContractionTree:
    """Contraction tree over an AbstractTensorNetwork.

    Parameters
    ----------
    tn : AbstractTensorNetwork
        The (possibly already sliced) network. The tree takes ownership:
        ``slicing``/``add_bond`` mutate it.
    order : list[(int, int)]
        Pairwise contraction order over representative tensor ids: each pair
        (i, j) merges the branch currently represented by j into i.
    """

    def __init__(self, tn, order):
        self.tn = tn
        self.order = list(order)
        self.leaves = {}
        branch = {}
        root = None
        for i, j in self.order:
            left = branch.get(i) or self._make_leaf(i)
            right = branch.get(j) or self._make_leaf(j)
            root = self._make_parent(left, right)
            branch[i] = root
        if root is None:
            # degenerate single-tensor network: the lone leaf is the root
            (tid,) = tn.tensor_bonds.keys()
            root = self._make_leaf(tid)
        self.root = root

    def _make_leaf(self, tid):
        node = Node()
        node.leaf_id = tid
        node.refresh(self.tn)
        self.leaves[tid] = node
        return node

    def _make_parent(self, left, right):
        node = Node()
        node.left, node.right = left, right
        left.parent = right.parent = node
        node.refresh(self.tn)
        return node

    # -- traversal --------------------------------------------------------

    def nodes_root_to_leaves(self):
        out = []
        stack = [self.root]
        while stack:
            v = stack.pop()
            out.append(v)
            if not v.is_leaf():
                stack.append(v.left)
                stack.append(v.right)
        return out

    def nodes_leaves_to_root(self):
        out = self.nodes_root_to_leaves()
        out.reverse()
        return out

    # -- complexity -------------------------------------------------------

    def complexity(self):
        """(tc, sc, mc): log10 total mul-adds, log2 max elements, log10 mem."""
        tcs, scs, mcs = [], [], []
        for v in self.nodes_root_to_leaves():
            scs.append(v.sc)
            if not v.is_leaf():
                tcs.append(v.tc)
                mcs.append(v.mc)
        return log10sumexp2(tcs), max(scs), log10sumexp2(mcs)

    @staticmethod
    def local_complexity(internal, leaves):
        """Complexity of a connected sub-forest given its internal nodes/leaves."""
        tcs = [v.tc for v in internal]
        mcs = [v.mc for v in internal]
        scs = [v.sc for v in internal] + [v.sc for v in leaves]
        return log10sumexp2(tcs), max(scs), log10sumexp2(mcs)

    def complexity_with_order(self, leaves, order):
        """What-if complexity of re-contracting ``leaves`` in ``order``.

        Builds throwaway cost nodes only; the tree is untouched.
        """
        branch = {}
        tcs, scs, mcs = [], [], []
        for i, j in order:
            left = branch.get(i, leaves[i])
            right = branch.get(j, leaves[j])
            probe = Node()
            probe.left, probe.right = left, right
            probe.refresh(self.tn)
            branch[i] = probe
            tcs.append(probe.tc)
            scs.append(probe.sc)
            mcs.append(probe.mc)
        scs += [v.sc for v in leaves]
        return log10sumexp2(tcs), max(scs), log10sumexp2(mcs)

    # -- slicing ----------------------------------------------------------

    def slice_candidates(self):
        """Bonds on the boundary of any maximal-sc node.

        Open (degree-1) bonds are excluded: slicing sums over the sliced
        index, which would silently marginalize an output leg.  (The
        reference allows them, contraction_tree.py:187-201 — a latent
        correctness hazard when sc_target < #open legs.)  May return an
        empty set, meaning the sc budget is unreachable by slicing.
        """
        _, sc, _ = self.complexity()
        pool = set()
        for v in self.nodes_root_to_leaves():
            if v.sc == sc:
                pool.update(
                    b for b in v.boundary
                    if len(self.tn.bond_tensors[b]) > 1)
        return pool

    def _refresh_marked(self, marked):
        for v in self.nodes_leaves_to_root():
            if v in marked:
                v.refresh(self.tn)

    def slicing(self, bond):
        """Remove ``bond`` from the network and refresh affected caches."""
        endpoints = self.tn.bond_tensors[bond]
        marked = set()
        for tid in endpoints:
            v = self.leaves[tid]
            while v is not None and v not in marked:
                marked.add(v)
                if bond in v.contract_bonds:
                    break
                v = v.parent
        self.tn.slicing(bond)
        self._refresh_marked(marked)

    def add_bond(self, bond):
        """Restore a sliced bond and refresh affected caches."""
        endpoints = self.tn.add_bond(bond)
        marked = set()
        for tid in endpoints:
            v = self.leaves[tid]
            while v is not None and v not in marked:
                marked.add(v)
                v = v.parent
        self._refresh_marked(marked)

    def whatif_slice(self, bond):
        """(tc, sc, mc) if ``bond`` were sliced, without mutating anything.

        Single pass over the tree adjusting each affected node's cached
        numbers; mirrors the reference's incremental estimate
        (contraction_tree.py:244-278), including its treatment of the
        outer-product tc adjustment.
        """
        dim = log2(self.tn.bond_dims[bond])
        tcs, scs, mcs = [], [], []
        for v in self.nodes_root_to_leaves():
            if v.has_bond(bond):
                sc = v.sc - dim if bond in v.boundary else v.sc
                if v.is_leaf():
                    scs.append(sc)
                    continue
                tc = v.tc - dim
                if bond in v.contract_bonds and len(v.contract_bonds) == 1:
                    tc -= 1.0
                sc_l = v.left.sc - dim if v.left.has_bond(bond) else v.left.sc
                sc_r = v.right.sc - dim if v.right.has_bond(bond) else v.right.sc
                tcs.append(tc)
                scs.append(sc)
                mcs.append(log2sumexp2([sc_l, sc_r, sc]))
            else:
                scs.append(v.sc)
                if not v.is_leaf():
                    tcs.append(v.tc)
                    mcs.append(v.mc)
        return log10sumexp2(tcs), max(scs), log10sumexp2(mcs)

    # -- local rewrites (simulated annealing moves) -----------------------

    def spanning_subtree(self, root, size=3):
        """BFS a subtree of ~``size`` frontier nodes below ``root``.

        Returns (frontier, internal): ``frontier`` are the subtree's leaves
        (tree nodes, not necessarily network leaves), ``internal`` the visited
        interior nodes in bottom-up order (root last).
        """
        queue = [root]
        leaves = []
        visited = []
        while queue and len(queue) + len(leaves) < size:
            v = queue.pop(0)
            visited.append(v)
            if v.is_leaf():
                leaves.append(v)
            else:
                queue.append(v.left)
                queue.append(v.right)
        frontier = queue + leaves
        internal = visited + queue
        internal.reverse()
        return frontier, internal

    @staticmethod
    def current_order_3(subroot, frontier):
        """The 3-leaf contraction order currently realized under ``subroot``."""
        branch = subroot.left if subroot.left not in frontier else subroot.right
        assert branch not in frontier, "malformed local subtree"
        first = sorted((frontier.index(branch.left), frontier.index(branch.right)))
        if first == [0, 2]:
            return [(0, 2), (0, 1)]
        if first == [0, 1]:
            return [(0, 1), (0, 2)]
        assert first == [1, 2]
        return [(1, 2), (0, 1)]

    def apply_local_order(self, order, frontier, internal, subroot):
        """Re-wire the subtree under ``subroot`` to realize ``order``.

        Only interior caches below/at ``subroot`` change; ancestors keep
        their numbers because the subtree's leaf set (hence boundary and sc)
        is unchanged.
        """
        slots = list(frontier)
        for idx, (i, j) in enumerate(order):
            left, right = slots[i], slots[j]
            if idx < len(order) - 1:
                parent = Node()
                parent.left, parent.right = left, right
                left.parent = right.parent = parent
                parent.refresh(self.tn)
            else:
                parent = subroot
                parent.left, parent.right = left, right
                left.parent = right.parent = parent
                parent.refresh(self.tn)
            slots[i] = parent

    # -- order export -----------------------------------------------------

    def mark_representatives(self):
        """Pick, per node, the child branch whose result tensor is larger.

        The representative's buffer is reused for the step output ("contract
        j into i"); ties go to the right child like the reference
        (contraction_tree.py:305-314).
        """
        for v in self.nodes_leaves_to_root():
            if v.is_leaf():
                v.rep = min(v.leaf_id, v.leaf_id)  # == leaf_id
            else:
                v.rep = v.left.rep if v.left.sc > v.right.sc else v.right.rep

    def to_order_bfs(self):
        """Breadth-first order keyed by min contained tensor id (stable)."""
        mins = {}
        for v in self.nodes_leaves_to_root():
            mins[id(v)] = v.leaf_id if v.is_leaf() else min(
                mins[id(v.left)], mins[id(v.right)])
        order = []
        queue = [self.root]
        while queue:
            v = queue.pop(0)
            if not v.is_leaf():
                queue += [v.left, v.right]
                a, b = mins[id(v.left)], mins[id(v.right)]
                order.append((min(a, b), max(a, b)))
        order.reverse()
        return order

    def to_order_dfs(self):
        """Depth-first order over representative ids (scheme emission order)."""
        self.mark_representatives()
        order = []
        stack = [self.root]
        while stack:
            v = stack.pop()
            if v.is_leaf():
                continue
            if v.rep == v.left.rep:
                order.append((v.left.rep, v.right.rep))
            else:
                order.append((v.right.rep, v.left.rep))
            if v.left.sc > v.right.sc:
                stack += [v.left, v.right]
            else:
                stack += [v.right, v.left]
        order.reverse()
        return order

    # -- snapshots --------------------------------------------------------

    def snapshot(self):
        """Cheap restorable state: (bfs order, sliced bond labels)."""
        return self.to_order_bfs(), tuple(self.tn.sliced.keys())

    @classmethod
    def from_snapshot(cls, pristine_tn, snap):
        """Rebuild a tree from ``snapshot()`` output onto a fresh tn clone."""
        order, sliced = snap
        tn = clone_network(pristine_tn)
        for bond in sliced:
            tn.slicing(bond)
        return cls(tn, order)


def clone_network(tn):
    """Cheap structural copy of an AbstractTensorNetwork (no payloads)."""
    from ..network import AbstractTensorNetwork

    new = AbstractTensorNetwork.__new__(AbstractTensorNetwork)
    new.tensor_bonds = {t: list(b) for t, b in tn.tensor_bonds.items()}
    new.bond_dims = dict(tn.bond_dims)
    new.bond_tensors = {b: set(s) for b, s in tn.bond_tensors.items()}
    new.final_qubits = tuple(tn.final_qubits)
    new.num_fq = dict(tn.num_fq)
    new.max_bitstring = tn.max_bitstring
    new.log2_max_bitstring = tn.log2_max_bitstring
    new.sliced = {b: (d, set(s)) for b, (d, s) in tn.sliced.items()}
    return new
