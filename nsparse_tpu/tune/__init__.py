from nsparse_tpu.tune.plan import Plan
from nsparse_tpu.tune.autotune import autotune_spmv

__all__ = ["Plan", "autotune_spmv"]
