"""Dense decomposition stack (L3) + high-level solver API (L5).

SURVEY §2.4: Cholesky family, LU (partial/full pivot), QR (± column pivot),
SVD, self-adjoint/general EVD, generalized EVD; §2.3 ``solvers``.
"""
from faer_tpu.linalg import cholesky, lu, qr

__all__ = [
    "cholesky", "lu", "qr", "solvers", "svd", "evd", "gevd", "qz", "batched",
    "bidiag", "bidiag_svd", "bidiag_dnc", "tridiag", "tridiag_evd",
    "tridiag_dnc", "real_schur", "eigvec", "evd_cpair", "qz_cpair",
    "qz_real", "factor_cpair", "factor_dd", "factor_ddc", "schur_multishift",
]
