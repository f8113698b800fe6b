"""Host-side contraction planner (pure Python/numpy — never imports jax).

Given the hypergraph of a tensor network, find a pairwise contraction order
(binary tree) minimizing time/space/memory complexity, with dynamic slicing
of bonds to fit a log2 memory budget (``sc_target``).
"""

from .cost import score, merge_cost, leaf_cost
from .greedy import GreedyOrderFinder
from .tree import ContractionTree, clone_network
from .annealing import find_order, simulate_annealing, sa_trial

__all__ = [
    "score", "merge_cost", "leaf_cost",
    "GreedyOrderFinder", "ContractionTree", "clone_network",
    "find_order", "simulate_annealing", "sa_trial",
]
