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


def _is_complex_obj(a) -> bool:
    import numpy as np

    if isinstance(a, Mat):
        a = a.a
    return np.iscomplexobj(a) if isinstance(a, np.ndarray) else dtypes.is_complex(
        getattr(a, "dtype", jnp.float32))


def _split_complex_if_needed(a, force: bool = False):
    """On the complex-free TPU backend, complex inputs become (re, im) device
    pairs (the ``factor_cpair`` path — faer drives c32/c64 through the same
    generic code, ``faer-traits/src/lib.rs:1224``).  Returns (value, is_pair).
    Pair-backed solver objects return host numpy complex arrays from their
    methods when used EAGERLY; under ``jit``/``vmap`` tracing they return
    (re, im) pairs, so the complex API composes with jax transforms."""
    import numpy as np

    from faer_tpu.linalg.evd import _complex_unsupported

    if isinstance(a, Mat):
        a = a.a
    if isinstance(a, tuple) and len(a) == 2:
        return a, True
    if _is_complex_obj(a) and (force or _complex_unsupported()):
        an = np.asarray(a)
        rdt = np.float32 if an.dtype == np.complex64 else np.float64
        return (jnp.asarray(an.real.astype(rdt)),
                jnp.asarray(an.imag.astype(rdt))), True
    if force:                         # real rhs against a pair-backed factor
        aj = _unmat(a)
        return (aj, jnp.zeros_like(aj)), True
    return a, False


def _pair_to_host(pair):
    """Finalize a pair-backed result: eager (concrete) results become host
    complex arrays for ergonomic parity with faer's complex API; under
    ``jit``/``vmap`` tracing the (re, im) pair is returned unchanged, so the
    whole pair-backed solver layer composes with jax transforms
    (faer ``solvers.rs:697-765`` uniform dtype coverage)."""
    if not (jax.core.is_concrete(pair[0]) and jax.core.is_concrete(pair[1])):
        return pair
    import numpy as np

    re = np.asarray(jax.device_get(pair[0]))
    im = np.asarray(jax.device_get(pair[1]))
    cdt = np.complex64 if re.dtype == np.float32 else np.complex128
    return re.astype(cdt) + 1j * im.astype(cdt)


def _perm_parity_device(perm):
    """Permutation parity as a device scalar (inversion count mod 2)."""
    p = perm.astype(jnp.int32)
    n = p.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    inv = jnp.sum(((i < j) & (p[:, None] > p[None, :])).astype(jnp.int32))
    return inv % 2


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
        ap, is_pair = _split_complex_if_needed(a)
        if is_pair:
            from faer_tpu.linalg import factor_cpair as _fc

            ar, ai = ap
            if side is not Side.LOWER:
                ar, ai = ar.T, -ai.T
            l, info = _fc.llt_factor_pair(ar, ai)
            if check and not jax.core.is_concrete(info.success):
                check = False                          # under jit: no host check
            if check and not bool(info.success):
                raise NonPositivePivotError("matrix is not positive definite")
            return Llt(l=l, info=info)
        l, info = _ch.llt_factor(_lower_of(a, side))
        if check and not jax.core.is_concrete(l):
            check = False
        if check and not bool(info.success):
            raise NonPositivePivotError("matrix is not positive definite")
        return Llt(l=l, info=info)

    def solve(self, rhs):
        if isinstance(self.l, tuple):
            from faer_tpu.linalg import factor_cpair as _fc

            bp, _ = _split_complex_if_needed(rhs, force=True)
            l = (jnp.tril(self.l[0]), jnp.tril(self.l[1]))
            return _pair_to_host(_fc.llt_solve_pair(l, *bp))
        return _ch.llt_solve(self.l, _unmat(rhs))

    def solve_conjugate(self, rhs):
        if isinstance(self.l, tuple):
            bp, _ = _split_complex_if_needed(rhs, force=True)
            out = self.solve((bp[0], -bp[1]))
            if isinstance(out, tuple):                  # under jit: pair out
                return (out[0], -out[1])
            return out.conj()
        return jnp.conj(_ch.llt_solve(jnp.conj(self.l), jnp.conj(_unmat(rhs))))

    def inverse(self):
        if isinstance(self.l, tuple):
            n = self.l[0].shape[0]
            eye = jnp.eye(n, dtype=self.l[0].dtype)
            return self.solve((eye, jnp.zeros_like(eye)))
        return _ch.llt_inverse(self.l)

    def reconstruct(self):
        if isinstance(self.l, tuple):
            from faer_tpu.core.cpair import pmatmul

            lt = (jnp.tril(self.l[0]), jnp.tril(self.l[1]))
            return _pair_to_host(pmatmul(lt, (lt[0].T, -lt[1].T)))
        return _ch.llt_reconstruct(self.l)

    def determinant(self):
        lr = self.l[0] if isinstance(self.l, tuple) else self.l
        d = jnp.prod(jnp.real(jnp.diagonal(lr)))
        return (d * d).astype(jnp.real(lr).dtype if isinstance(self.l, tuple)
                              else self.l.dtype)

    def logdet(self):
        lr = self.l[0] if isinstance(self.l, tuple) else self.l
        return 2.0 * jnp.sum(jnp.log(jnp.real(jnp.diagonal(lr))))

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
        ap, is_pair = _split_complex_if_needed(a)
        if is_pair:
            from faer_tpu.linalg import factor_cpair as _fc

            ar, ai = ap
            if side is not Side.LOWER:
                ar, ai = ar.T, -ai.T
            ld, info = _fc.ldlt_factor_pair(ar, ai)
            return Ldlt(ld=ld, info=info)
        ld, info = _ch.ldlt_factor(_lower_of(a, side))
        return Ldlt(ld=ld, info=info)

    def solve(self, rhs):
        if isinstance(self.ld, tuple):
            from faer_tpu.linalg import factor_cpair as _fc

            bp, _ = _split_complex_if_needed(rhs, force=True)
            return _pair_to_host(_fc.ldlt_solve_pair(self.ld, *bp))
        return _ch.ldlt_solve(self.ld, _unmat(rhs))

    def inverse(self):
        return _ch.ldlt_solve(self.ld, jnp.eye(self.ld.shape[0], dtype=self.ld.dtype))

    def reconstruct(self):
        return _ch.ldlt_reconstruct(self.ld)

    def determinant(self):
        return jnp.prod(jnp.real(jnp.diagonal(self.ld))).astype(self.ld.dtype)

    def rank_update(self, w, alpha) -> "Ldlt":
        """L D Lᴴ + α w wᴴ (faer ``ldlt/update.rs:376``)."""
        return Ldlt(ld=_ch.ldlt_rank_r_update(self.ld, _unmat(w), alpha),
                    info=self.info)

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
        ap, is_pair = _split_complex_if_needed(a)
        if is_pair:
            from faer_tpu.linalg import factor_cpair as _fc

            if ap[0].shape[-2] != ap[0].shape[-1]:
                raise ShapeError("PartialPivLu requires a square matrix")
            packed, perm, ok = _fc.lu_in_place_pair(*ap)
            return PartialPivLu(lu=packed, row_perm=perm, info=ok)
        a = _unmat(a)
        if a.shape[-2] != a.shape[-1]:
            raise ShapeError("PartialPivLu requires a square matrix")
        lu, perm, info = _lu.lu_in_place(a)
        return PartialPivLu(lu=lu, row_perm=perm, info=info)

    def solve(self, rhs):
        if isinstance(self.lu, tuple):
            from faer_tpu.linalg import factor_cpair as _fc

            bp, _ = _split_complex_if_needed(rhs, force=True)
            return _pair_to_host(_fc.lu_solve_pair(self.lu, self.row_perm, *bp))
        return _lu.lu_solve(self.lu, self.row_perm, _unmat(rhs))

    def solve_transpose(self, rhs):
        if isinstance(self.lu, tuple):
            raise NotImplementedError(
                "solve_transpose on the pair-backed complex LU: solve with "
                "the adjoint factorization instead")
        return _lu.lu_solve_transpose(self.lu, self.row_perm, _unmat(rhs))

    def inverse(self):
        if isinstance(self.lu, tuple):
            from faer_tpu.linalg import factor_cpair as _fc

            n = self.lu[0].shape[0]
            eye = jnp.eye(n, dtype=self.lu[0].dtype)
            return _pair_to_host(_fc.lu_solve_pair(
                self.lu, self.row_perm, eye, jnp.zeros_like(eye)))
        return _lu.lu_inverse(self.lu, self.row_perm)

    def reconstruct(self):
        if isinstance(self.lu, tuple):
            from faer_tpu.core.cpair import pmatmul

            l = (jnp.tril(self.lu[0], -1) + jnp.eye(self.lu[0].shape[0],
                                                    dtype=self.lu[0].dtype),
                 jnp.tril(self.lu[1], -1))
            u = (jnp.triu(self.lu[0]), jnp.triu(self.lu[1]))
            pr, pi = pmatmul(l, u)
            pr = permod.permute_rows_inverse(pr, self.row_perm)
            pi = permod.permute_rows_inverse(pi, self.row_perm)
            return _pair_to_host((pr, pi))
        return _lu.lu_reconstruct(self.lu, self.row_perm)

    def determinant(self):
        if isinstance(self.lu, tuple):
            dr, di = jnp.diagonal(self.lu[0]), jnp.diagonal(self.lu[1])
            if jax.core.is_concrete(dr):
                # eager: complex128 host product (avoids f32 overflow — |det|
                # of a 64² Gaussian already exceeds f32 range)
                import numpy as np

                du = _pair_to_host((dr, di)).astype(np.complex128)
                sign = 1.0 if int(_perm_parity_device(self.row_perm)) == 0 else -1.0
                return sign * np.prod(du)

            # under jit: (re, im) scan in the factor dtype (dtype-range
            # limited, same contract as faer's T-valued determinant)
            def mulc(c, d):
                return (c[0] * d[0] - c[1] * d[1],
                        c[0] * d[1] + c[1] * d[0]), None

            (pr, pi), _ = jax.lax.scan(
                mulc, (jnp.ones((), dr.dtype), jnp.zeros((), dr.dtype)),
                (dr, di))
            sign = jnp.where(_perm_parity_device(self.row_perm) == 0,
                             1.0, -1.0).astype(dr.dtype)
            return (pr * sign, pi * sign)
        return _lu.lu_determinant(self.lu, self.row_perm, self.info.transposition_count)

    @property
    def L(self):
        if isinstance(self.lu, tuple):
            n = self.lu[0].shape[0]
            eye = jnp.eye(n, dtype=self.lu[0].dtype)
            return _pair_to_host((jnp.tril(self.lu[0], -1) + eye,
                                  jnp.tril(self.lu[1], -1)))
        n = self.lu.shape[0]
        return jnp.tril(self.lu, -1) + jnp.eye(n, dtype=self.lu.dtype)

    @property
    def U(self):
        if isinstance(self.lu, tuple):
            return _pair_to_host((jnp.triu(self.lu[0]), jnp.triu(self.lu[1])))
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
        ap, is_pair = _split_complex_if_needed(a)
        if is_pair:
            from faer_tpu.linalg import factor_cpair as _fc

            packed, ts, block = _fc.qr_in_place_pair(*ap)
            return Qr(packed=packed, t_stack=ts, block=block)
        packed, ts, block = _qr.qr_in_place(_unmat(a))
        return Qr(packed=packed, t_stack=ts, block=block)

    def solve(self, rhs):
        if isinstance(self.packed, tuple):
            return self.solve_lstsq(rhs)
        if self.packed.shape[0] != self.packed.shape[1]:
            raise ShapeError("Qr.solve requires a square matrix; use solve_lstsq")
        return _qr.qr_solve(self.packed, self.t_stack, self.block, _unmat(rhs))

    def solve_lstsq(self, rhs):
        if isinstance(self.packed, tuple):
            from faer_tpu.linalg import factor_cpair as _fc

            bp, _ = _split_complex_if_needed(rhs, force=True)
            return _pair_to_host(_fc.qr_solve_lstsq_pair(
                self.packed, self.t_stack, self.block, bp))
        return _qr.qr_solve_lstsq(self.packed, self.t_stack, self.block, _unmat(rhs))

    def inverse(self):
        if isinstance(self.packed, tuple):
            n = self.packed[0].shape[1]
            eye = jnp.eye(n, dtype=self.packed[0].dtype)
            return self.solve_lstsq((eye, jnp.zeros_like(eye)))
        return _qr.qr_inverse(self.packed, self.t_stack, self.block)

    def reconstruct(self):
        if isinstance(self.packed, tuple):
            m, n = self.packed[0].shape
            k = min(m, n)
            rr = jnp.zeros((m, n), self.packed[0].dtype).at[:k].set(
                jnp.triu(self.packed[0])[:k])
            ri = jnp.zeros((m, n), self.packed[0].dtype).at[:k].set(
                jnp.triu(self.packed[1])[:k])
            return _pair_to_host(self.apply_q((rr, ri)))
        return _qr.qr_reconstruct(self.packed, self.t_stack, self.block)

    def compute_q(self, *, thin: bool = True):
        if isinstance(self.packed, tuple):
            m = self.packed[0].shape[0]
            k = min(self.packed[0].shape) if thin else m
            eye = jnp.eye(m, k, dtype=self.packed[0].dtype)
            return _pair_to_host(self.apply_q((eye, jnp.zeros_like(eye))))
        return _qr.qr_compute_q(self.packed, self.t_stack, self.block, thin=thin)

    def apply_q(self, rhs, *, adjoint: bool = False):
        if isinstance(self.packed, tuple):
            from faer_tpu.linalg import factor_cpair as _fc

            bp, _ = _split_complex_if_needed(rhs, force=True)
            return _fc.qr_apply_q_pair(self.packed, self.t_stack, self.block,
                                       bp, adjoint=adjoint)
        return _qr.qr_apply_q(self.packed, self.t_stack, self.block, _unmat(rhs),
                              adjoint=adjoint)

    @property
    def R(self):
        if isinstance(self.packed, tuple):
            k = min(self.packed[0].shape)
            return _pair_to_host((jnp.triu(self.packed[0])[:k, :],
                                  jnp.triu(self.packed[1])[:k, :]))
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
        ap, is_pair = _split_complex_if_needed(a)
        if is_pair:
            from faer_tpu.linalg import factor_cpair as _fc

            packed, taus, perm = _fc.col_piv_qr_in_place_pair(*ap)
            return ColPivQr(packed=packed, taus=taus, col_perm=perm)
        packed, taus, perm = _qr.col_piv_qr_in_place(_unmat(a))
        return ColPivQr(packed=packed, taus=taus, col_perm=perm)

    def solve(self, rhs):
        return self.solve_lstsq(rhs)

    def solve_lstsq(self, rhs):
        if isinstance(self.packed, tuple):
            from faer_tpu.linalg import factor_cpair as _fc

            bp, _ = _split_complex_if_needed(rhs, force=True)
            n = self.packed[0].shape[1]
            # one-reflector-at-a-time Qᴴb, then the pair R solve + unpermute
            qtb = bp
            m = self.packed[0].shape[0]
            rows = jnp.arange(m)
            for j in range(min(self.packed[0].shape)):
                vr = jnp.where(rows == j, 1.0,
                               jnp.where(rows > j, self.packed[0][:, j], 0.0))
                vi = jnp.where(rows > j, self.packed[1][:, j], 0.0)
                qtb = _fc._papply_house_left(
                    qtb, (vr, vi), (self.taus[0][j], self.taus[1][j]),
                    conj_tau=True)
            r = (jnp.triu(self.packed[0][:n, :n]),
                 jnp.triu(self.packed[1][:n, :n]))
            x = _fc._psolve_upper(r, (qtb[0][:n], qtb[1][:n]))
            xr = permod.permute_rows_inverse(x[0], self.col_perm)
            xi = permod.permute_rows_inverse(x[1], self.col_perm)
            return _pair_to_host((xr, xi))
        return _qr.col_piv_qr_solve_lstsq(self.packed, self.taus, self.col_perm,
                                          _unmat(rhs))

    def reconstruct(self):
        if isinstance(self.packed, tuple):
            raise NotImplementedError(
                "reconstruct on the pair-backed ColPivQr is not implemented; "
                "use solve_lstsq/rank")
        return _qr.col_piv_qr_reconstruct(self.packed, self.taus, self.col_perm)

    def rank(self, tol=None):
        if isinstance(self.packed, tuple):
            k = min(self.packed[0].shape)
            d = jnp.sqrt(jnp.diagonal(self.packed[0][:k, :k]) ** 2
                         + jnp.diagonal(self.packed[1][:k, :k]) ** 2)
            if tol is None:
                tol = jnp.max(d) * max(self.packed[0].shape) * dtypes.eps(
                    self.packed[0].dtype)
            return jnp.sum(d > tol)
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

        ap, is_pair = _split_complex_if_needed(a)
        if is_pair:
            from faer_tpu.linalg import factor_cpair as _fc

            if not thin:
                raise NotImplementedError(
                    "full (non-thin) SVD is not available on the pair-backed "
                    "complex path; use thin=True")
            ar, ai = ap
            if ar.shape[0] >= ar.shape[1]:
                s, u, v, info = _fc.svd_pair(ar, ai)
            else:                       # A = U S Vᴴ ⇔ Aᴴ = V S Uᴴ
                s, v, u, info = _fc.svd_pair(ar.T, -ai.T)
            return Svd(u=u, s=s, v=v, info=info)
        u, s, v, info = _svd.svd(_unmat(a), thin=thin)
        return Svd(u=u, s=s, v=v, info=info)

    @property
    def U(self):
        return _pair_to_host(self.u) if isinstance(self.u, tuple) else self.u

    @property
    def S(self):
        return self.s

    @property
    def V(self):
        return _pair_to_host(self.v) if isinstance(self.v, tuple) else self.v

    def reconstruct(self):
        if isinstance(self.u, tuple):
            from faer_tpu.core.cpair import pmatmul

            us = (self.u[0] * self.s[None, :], self.u[1] * self.s[None, :])
            return _pair_to_host(pmatmul(us, (self.v[0].T, -self.v[1].T)))
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
