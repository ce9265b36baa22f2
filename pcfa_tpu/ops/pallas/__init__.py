"""Pallas TPU kernels for the correlation hot paths (SURVEY.md §2.5).

Each kernel has a pure-XLA twin in `pcfa_tpu/ops` used as the correctness
reference (plus the native C++ oracle in `pcfa_tpu/native`). Kernels are
used on TPU backends; other backends fall back to the XLA implementation.
"""

from pcfa_tpu.ops.pallas.local_corr import (
    global_correlation_pallas,
    local_correlation_pallas,
)
