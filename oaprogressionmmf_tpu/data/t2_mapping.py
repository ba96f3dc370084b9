"""T2-map fitting surface for the data-prep apps.

Thin re-export: the actual math is one fused XLA kernel in ops/t2_fit.py
(the TPU-native replacement for the reference's Numba prange kernel,
koafusion/datasets/_mr_t2_mapping.py:33-68).
"""

from ..ops.t2_fit import fit_exp_linear, fit_t2_map

__all__ = ["fit_t2_map", "fit_exp_linear"]
