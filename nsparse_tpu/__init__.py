"""nsparse_tpu — TPU-native sparse matrix kernel library.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of nsparse
(EBD-CREST, reference: /root/reference — AMB-format auto-tuned SpMV and
two-phase hash SpGEMM), designed TPU-first:

- The reference's shared-memory hash-table SpGEMM (symbolic nnz count +
  numeric accumulate, ``cuda-c/src/kernel/kernel_spgemm_hash_template.cu``)
  is reformulated as **expand / sort / compress** row products using
  ``jax.lax.sort`` + ``segment_sum`` — TPUs have no scatter atomics, and
  deterministic sort/reduce is both race-free and vectorizes on the VPU.
- The reference's AMB format (adaptive multi-level blocking,
  ``cuda-c/src/conversion/convert_amb.cu``) becomes sigma-sorted ELL slabs
  and blocked-sparse-row (BSR) tiles sized to the MXU/VPU geometry.
- Thrust sort/scan become ``jax.lax`` primitives; per-row FLOP binning
  (``set_max_bin``/``set_min_bin``) becomes padded per-bin batches.
- The cuSPARSE baseline role is played by ``scipy.sparse`` (oracle) and
  ``jax.experimental.sparse`` (vendor-ish XLA baseline).
"""

from nsparse_tpu.utils.hostmem import tune_host_memory as _tune_host_memory

_tune_host_memory()  # THP off: 2-3x faster plan builds on microVM hosts

from nsparse_tpu.formats.csr import CSR
from nsparse_tpu.formats.coo import COO
from nsparse_tpu.formats.ell import ELL
from nsparse_tpu.formats.bsr import BSR
from nsparse_tpu.formats.dia import DIA
from nsparse_tpu.io.matrix_market import read_mtx, write_mtx
from nsparse_tpu.ops.spmv import (spmv, spmv_csr, spmv_dia, spmv_ell,
                                  spmm, spmm_csr, spmm_bsr)
from nsparse_tpu.ops.spgemm import (
    spgemm,
    spgemm_flops,
    SpgemmPlan,
    spgemm_plan,
    spgemm_numeric,
)
from nsparse_tpu.ops.spgemm_bsr import (
    BsrSpgemmPlan,
    choose_spgemm_path,
    plan_spgemm_bsr,
    spgemm_bsr,
)
from nsparse_tpu.tune.plan import Plan
from nsparse_tpu.tune.autotune import autotune_spmv

__version__ = "0.1.0"

__all__ = [
    "CSR",
    "COO",
    "ELL",
    "BSR",
    "DIA",
    "read_mtx",
    "write_mtx",
    "spmv",
    "spmv_csr",
    "spmv_dia",
    "spmv_ell",
    "spmm",
    "spmm_csr",
    "spmm_bsr",
    "spgemm",
    "spgemm_flops",
    "SpgemmPlan",
    "spgemm_plan",
    "spgemm_numeric",
    "BsrSpgemmPlan",
    "choose_spgemm_path",
    "plan_spgemm_bsr",
    "spgemm_bsr",
    "Plan",
    "autotune_spmv",
]
