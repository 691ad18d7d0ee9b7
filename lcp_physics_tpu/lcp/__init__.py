"""Batched differentiable LCP/QP solver (reference parity:
``lcp_physics/lcp/``)."""

from lcp_physics_tpu.lcp.cone import ConeF
from lcp_physics_tpu.lcp.lcp import (LCPFunction, lcp_solve,
                                     lcp_solve_full)
from lcp_physics_tpu.lcp.pdipm import (PdipmSolution, pdipm_solve,
                                       solve_eq_kkt)
from lcp_physics_tpu.lcp.util import (batch, bger, expandParam,
                                      expand_param, extract_batch_size,
                                      extract_nBatch, get_sizes)

__all__ = [
    "ConeF", "LCPFunction", "lcp_solve", "lcp_solve_full", "pdipm_solve", "PdipmSolution",
    "solve_eq_kkt", "batch", "bger", "expandParam", "expand_param",
    "extract_batch_size", "extract_nBatch", "get_sizes",
]
