from nsparse_tpu.formats.coo import COO
from nsparse_tpu.formats.csr import CSR
from nsparse_tpu.formats.ell import ELL
from nsparse_tpu.formats.bsr import BSR

__all__ = ["COO", "CSR", "ELL", "BSR"]
