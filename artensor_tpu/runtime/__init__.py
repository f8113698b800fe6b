"""Plan -> static scheme -> jitted execution on TPU."""

from .scheme import contraction_scheme, DenseStep
from .executor import (
    tensor_contraction,
    execute_dense,
    build_slicing_axes,
    make_sliced_contraction,
    compile_dense,
)

__all__ = [
    "contraction_scheme", "DenseStep", "tensor_contraction",
    "execute_dense", "build_slicing_axes", "make_sliced_contraction",
    "compile_dense",
]
