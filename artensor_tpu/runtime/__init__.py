"""Plan -> static scheme -> jitted execution on TPU."""

from .scheme import contraction_scheme, DenseStep
from .sparse import (
    contraction_scheme_sparse,
    execute_sparse,
    tensor_contraction_sparse,
    compile_sparse,
    SparseStep,
)
from .executor import (
    tensor_contraction,
    execute_dense,
    build_slicing_axes,
    make_sliced_runner,
    make_sliced_contraction,
    compile_dense,
)

__all__ = [
    "contraction_scheme", "DenseStep", "contraction_scheme_sparse",
    "SparseStep", "tensor_contraction", "tensor_contraction_sparse",
    "execute_dense", "execute_sparse", "build_slicing_axes",
    "make_sliced_runner", "make_sliced_contraction", "compile_dense",
    "compile_sparse",
]
