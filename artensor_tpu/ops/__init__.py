"""TPU contraction primitives: XLA einsum paths and Pallas MXU kernels."""

from .einsum import pairwise_einsum, PRECISIONS

__all__ = ["pairwise_einsum", "PRECISIONS"]
