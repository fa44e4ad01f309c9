"""High-level decomposition objects + Solve traits.

Reference parity: ``faer/src/linalg/solvers.rs`` — the ``Solve``/``SolveLstsq``
traits (``:21-93,639``) and decomposition structs ``Llt/Ldlt/Lblt/
PartialPivLu/FullPivLu/Qr/ColPivQr/Svd/SelfAdjointEigen/Eigen/
GeneralizedEigen`` (``:697-765``), constructed by the ``Mat`` methods
(``:346-634``).

TPU-native design: each object is a frozen pytree of device arrays (factors +
info), so a factorization can be built once and its ``solve`` jit-ted /
vmapped / shard_mapped. The *eager* constructors (``Llt.new``) additionally
inspect info flags and raise typed errors on the host — under ``jit`` use the
functional layer (``faer_tpu.linalg.cholesky`` etc.) or ``check=False``.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes, perm as permod
from faer_tpu.core.errors import NonPositivePivotError, ShapeError
from faer_tpu.core.flags import Side
from faer_tpu.core.mat import Mat
from faer_tpu.linalg import cholesky as _ch
from faer_tpu.linalg import lu as _lu
from faer_tpu.linalg import qr as _qr
from faer_tpu.ops.matmul import matmul


def _unmat(a):
    return a.a if isinstance(a, Mat) else jnp.asarray(a)


def _lower_of(a, side: Side):
    a = _unmat(a)
    if a.shape[-2] != a.shape[-1]:
        raise ShapeError(f"expected square matrix, got {a.shape}")
    return a if side is Side.LOWER else jnp.conj(a).T


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    meta = [f.name for f in dataclasses.fields(cls) if f.metadata.get("static")]
    dyn = [n for n in fields if n not in meta]

    def flatten(x):
        return tuple(getattr(x, n) for n in dyn), tuple(getattr(x, n) for n in meta)

    def unflatten(aux, children):
        return cls(**dict(zip(dyn, children)), **dict(zip(meta, aux)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


def _static_field():
    return dataclasses.field(metadata={"static": True})


@_register
@dataclasses.dataclass(frozen=True)
class Llt:
    """Cholesky LLT solver object (faer ``solvers.rs:697``)."""

    l: Any
    info: Any

    @staticmethod
    def new(a, side: Side = Side.LOWER, *, check: bool = True) -> "Llt":
        l, info = _ch.llt_factor(_lower_of(a, side))
        if check and not jax.core.is_concrete(l):
            check = False
        if check and not bool(info.success):
            raise NonPositivePivotError("matrix is not positive definite")
        return Llt(l=l, info=info)

    def solve(self, rhs):
        return _ch.llt_solve(self.l, _unmat(rhs))

    def solve_conjugate(self, rhs):
        return jnp.conj(_ch.llt_solve(jnp.conj(self.l), jnp.conj(_unmat(rhs))))

    def inverse(self):
        return _ch.llt_inverse(self.l)

    def reconstruct(self):
        return _ch.llt_reconstruct(self.l)

    def determinant(self):
        d = jnp.prod(jnp.real(jnp.diagonal(self.l)))
        return (d * d).astype(self.l.dtype)

    def logdet(self):
        return 2.0 * jnp.sum(jnp.log(jnp.real(jnp.diagonal(self.l))))

    def rank_update(self, w, alpha) -> "Llt":
        return Llt(l=_ch.llt_rank_r_update(self.l, _unmat(w), alpha), info=self.info)

    @property
    def L(self):
        return self.l


@_register
@dataclasses.dataclass(frozen=True)
class Ldlt:
    ld: Any
    info: Any

    @staticmethod
    def new(a, side: Side = Side.LOWER) -> "Ldlt":
        ld, info = _ch.ldlt_factor(_lower_of(a, side))
        return Ldlt(ld=ld, info=info)

    def solve(self, rhs):
        return _ch.ldlt_solve(self.ld, _unmat(rhs))

    def inverse(self):
        return _ch.ldlt_solve(self.ld, jnp.eye(self.ld.shape[0], dtype=self.ld.dtype))

    def reconstruct(self):
        return _ch.ldlt_reconstruct(self.ld)

    def determinant(self):
        return jnp.prod(jnp.real(jnp.diagonal(self.ld))).astype(self.ld.dtype)

    @property
    def D(self):
        return jnp.real(jnp.diagonal(self.ld))


@_register
@dataclasses.dataclass(frozen=True)
class PivLlt:
    """Diagonal-pivoted LLT (rank-revealing, PSD)."""

    l: Any
    perm: Any
    rank: Any
    info: Any

    @staticmethod
    def new(a, side: Side = Side.LOWER) -> "PivLlt":
        l, perm, rank, info = _ch.piv_llt_factor(_lower_of(a, side))
        return PivLlt(l=l, perm=perm, rank=rank, info=info)

    def solve(self, rhs):
        return _ch.piv_llt_solve(self.l, self.perm, _unmat(rhs))

    def reconstruct(self):
        return _ch.piv_llt_reconstruct(self.l, self.perm)


@_register
@dataclasses.dataclass(frozen=True)
class Lblt:
    """Bunch-Kaufman LBLT (faer ``solvers.rs:705``)."""

    lb: Any
    subdiag: Any
    perm: Any
    info: Any

    @staticmethod
    def new(a, side: Side = Side.LOWER) -> "Lblt":
        lb, subdiag, perm, info = _ch.lblt_factor(_lower_of(a, side))
        return Lblt(lb=lb, subdiag=subdiag, perm=perm, info=info)

    def solve(self, rhs):
        return _ch.lblt_solve(self.lb, self.subdiag, self.perm, _unmat(rhs))

    def reconstruct(self):
        return _ch.lblt_reconstruct(self.lb, self.subdiag, self.perm)


@_register
@dataclasses.dataclass(frozen=True)
class PartialPivLu:
    """Partial-pivot LU solver (faer ``solvers.rs:713``)."""

    lu: Any
    row_perm: Any
    info: Any

    @staticmethod
    def new(a) -> "PartialPivLu":
        a = _unmat(a)
        if a.shape[-2] != a.shape[-1]:
            raise ShapeError("PartialPivLu requires a square matrix")
        lu, perm, info = _lu.lu_in_place(a)
        return PartialPivLu(lu=lu, row_perm=perm, info=info)

    def solve(self, rhs):
        return _lu.lu_solve(self.lu, self.row_perm, _unmat(rhs))

    def solve_transpose(self, rhs):
        return _lu.lu_solve_transpose(self.lu, self.row_perm, _unmat(rhs))

    def inverse(self):
        return _lu.lu_inverse(self.lu, self.row_perm)

    def reconstruct(self):
        return _lu.lu_reconstruct(self.lu, self.row_perm)

    def determinant(self):
        return _lu.lu_determinant(self.lu, self.row_perm, self.info.transposition_count)

    @property
    def L(self):
        n = self.lu.shape[0]
        return jnp.tril(self.lu, -1) + jnp.eye(n, dtype=self.lu.dtype)

    @property
    def U(self):
        return jnp.triu(self.lu)


@_register
@dataclasses.dataclass(frozen=True)
class FullPivLu:
    lu: Any
    row_perm: Any
    col_perm: Any
    info: Any

    @staticmethod
    def new(a) -> "FullPivLu":
        lu, rp, cp, info = _lu.full_piv_lu_in_place(_unmat(a))
        return FullPivLu(lu=lu, row_perm=rp, col_perm=cp, info=info)

    def solve(self, rhs):
        return _lu.full_piv_lu_solve(self.lu, self.row_perm, self.col_perm, _unmat(rhs))

    def reconstruct(self):
        return _lu.full_piv_lu_reconstruct(self.lu, self.row_perm, self.col_perm)

    def determinant(self):
        return _lu.lu_determinant(self.lu, self.row_perm, self.info.transposition_count)

    def rank(self, tol=None):
        d = jnp.abs(jnp.diagonal(self.lu))
        if tol is None:
            tol = jnp.max(d) * max(self.lu.shape) * dtypes.eps(self.lu.dtype)
        return jnp.sum(d > tol)


@_register
@dataclasses.dataclass(frozen=True)
class Qr:
    """Householder QR solver (faer ``solvers.rs:733``)."""

    packed: Any
    t_stack: Any
    block: int = _static_field()

    @staticmethod
    def new(a) -> "Qr":
        packed, ts, block = _qr.qr_in_place(_unmat(a))
        return Qr(packed=packed, t_stack=ts, block=block)

    def solve(self, rhs):
        if self.packed.shape[0] != self.packed.shape[1]:
            raise ShapeError("Qr.solve requires a square matrix; use solve_lstsq")
        return _qr.qr_solve(self.packed, self.t_stack, self.block, _unmat(rhs))

    def solve_lstsq(self, rhs):
        return _qr.qr_solve_lstsq(self.packed, self.t_stack, self.block, _unmat(rhs))

    def inverse(self):
        return _qr.qr_inverse(self.packed, self.t_stack, self.block)

    def reconstruct(self):
        return _qr.qr_reconstruct(self.packed, self.t_stack, self.block)

    def compute_q(self, *, thin: bool = True):
        return _qr.qr_compute_q(self.packed, self.t_stack, self.block, thin=thin)

    def apply_q(self, rhs, *, adjoint: bool = False):
        return _qr.qr_apply_q(self.packed, self.t_stack, self.block, _unmat(rhs),
                              adjoint=adjoint)

    @property
    def R(self):
        k = min(self.packed.shape)
        return jnp.triu(self.packed)[:k, :]


@_register
@dataclasses.dataclass(frozen=True)
class ColPivQr:
    packed: Any
    taus: Any
    col_perm: Any

    @staticmethod
    def new(a) -> "ColPivQr":
        packed, taus, perm = _qr.col_piv_qr_in_place(_unmat(a))
        return ColPivQr(packed=packed, taus=taus, col_perm=perm)

    def solve(self, rhs):
        return self.solve_lstsq(rhs)

    def solve_lstsq(self, rhs):
        return _qr.col_piv_qr_solve_lstsq(self.packed, self.taus, self.col_perm,
                                          _unmat(rhs))

    def reconstruct(self):
        return _qr.col_piv_qr_reconstruct(self.packed, self.taus, self.col_perm)

    def rank(self, tol=None):
        k = min(self.packed.shape)
        d = jnp.abs(jnp.diagonal(self.packed[:k, :k]))
        if tol is None:
            tol = jnp.max(d) * max(self.packed.shape) * dtypes.eps(self.packed.dtype)
        return jnp.sum(d > tol)


@_register
@dataclasses.dataclass(frozen=True)
class Svd:
    """SVD solver object (faer ``solvers.rs:749``)."""

    u: Any
    s: Any
    v: Any  # A = U diag(S) Vᴴ
    info: Any

    @staticmethod
    def new(a, *, thin: bool = True) -> "Svd":
        from faer_tpu.linalg import svd as _svd

        u, s, v, info = _svd.svd(_unmat(a), thin=thin)
        return Svd(u=u, s=s, v=v, info=info)

    @property
    def U(self):
        return self.u

    @property
    def S(self):
        return self.s

    @property
    def V(self):
        return self.v

    def reconstruct(self):
        return matmul(None, self.u * self.s[None, :].astype(self.u.dtype),
                      jnp.conj(self.v).T)

    def pseudoinverse(self, tol=None):
        from faer_tpu.linalg import svd as _svd

        return _svd.pseudoinverse_from_svd(self.u, self.s, self.v, tol=tol)

    def solve_lstsq(self, rhs):
        return matmul(None, self.pseudoinverse(), _unmat(rhs))

    def rank(self, tol=None):
        if tol is None:
            tol = jnp.max(self.s) * max(self.u.shape[0], self.v.shape[0]) * dtypes.eps(self.u.dtype)
        return jnp.sum(self.s > tol)


@_register
@dataclasses.dataclass(frozen=True)
class SelfAdjointEigen:
    """Self-adjoint EVD: A = V diag(w) Vᴴ, w ascending (faer ``solvers.rs:757``)."""

    v: Any
    w: Any
    info: Any

    @staticmethod
    def new(a, side: Side = Side.LOWER) -> "SelfAdjointEigen":
        from faer_tpu.linalg import evd as _evd

        w, v, info = _evd.self_adjoint_evd(_lower_of(a, side))
        return SelfAdjointEigen(v=v, w=w, info=info)

    @property
    def eigenvalues(self):
        return self.w

    @property
    def eigenvectors(self):
        return self.v

    def reconstruct(self):
        return matmul(None, self.v * self.w[None, :].astype(self.v.dtype),
                      jnp.conj(self.v).T)

    def solve(self, rhs):
        y = matmul(None, jnp.conj(self.v).T, _unmat(rhs))
        return matmul(None, self.v, y / self.w[:, None].astype(self.v.dtype))


@_register
@dataclasses.dataclass(frozen=True)
class Eigen:
    """General eigendecomposition: A V = V diag(w) (faer ``solvers.rs:761``)."""

    v: Any
    w: Any
    info: Any

    @staticmethod
    def new(a) -> "Eigen":
        from faer_tpu.linalg import evd as _evd

        w, v, info = _evd.evd(_unmat(a))
        return Eigen(v=v, w=w, info=info)

    @property
    def eigenvalues(self):
        return self.w

    @property
    def eigenvectors(self):
        return self.v


@_register
@dataclasses.dataclass(frozen=True)
class GeneralizedEigen:
    """Generalized eigendecomposition A v = λ B v as (α, β) pairs."""

    alpha: Any
    beta: Any
    v: Any
    info: Any

    @staticmethod
    def new(a, b) -> "GeneralizedEigen":
        from faer_tpu.linalg import gevd as _gevd

        alpha, beta, v, info = _gevd.gevd(_unmat(a), _unmat(b))
        return GeneralizedEigen(alpha=alpha, beta=beta, v=v, info=info)

    @property
    def eigenvalues(self):
        return self.alpha / self.beta
