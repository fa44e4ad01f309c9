"""Complex double-word ("cx128") arithmetic: split (re, im) pairs of DD.

Reference parity: faer's ``cx128`` scalar is ``Complex<fx128>``
(``faer-traits/src/lib.rs:5108-5111``) — every real double-double routine has
a complex twin.  TPU-native design: a cx128 array is a pytree pair of DD
pytrees (four same-shape base-f32 arrays total), complex-free like the
library's split-pair dense stack (``linalg/factor_cpair.py``); all ops are
elementwise VPU work built from the error-free transformations in
``utils.doubledouble``.

The pivot magnitude ``abs1_hi`` is the LAPACK-style ``|re| + |im|`` on the hi
words only — pivot *selection* needs no extended precision.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from faer_tpu.utils import doubledouble as dd
from faer_tpu.utils.doubledouble import DD


class DDC(NamedTuple):
    re: DD
    im: DD

    @property
    def dtype(self):
        return self.re.hi.dtype

    @property
    def shape(self):
        return self.re.hi.shape


def from_c128(x, base=jnp.float32) -> DDC:
    """Split a complex128 host array into a cx128 (DD re, DD im) pair."""
    import numpy as np

    x = np.asarray(x, np.complex128)
    return DDC(dd.from_f64(x.real, base), dd.from_f64(x.imag, base))


def to_c128(a: DDC):
    return dd.to_f64(a.re) + 1j * dd.to_f64(a.im)


def zeros_like(a: DDC) -> DDC:
    z = dd.from_float(jnp.zeros_like(a.re.hi))
    return DDC(z, z)


def add(a: DDC, b: DDC) -> DDC:
    return DDC(dd.add(a.re, b.re), dd.add(a.im, b.im))


def sub(a: DDC, b: DDC) -> DDC:
    return DDC(dd.sub(a.re, b.re), dd.sub(a.im, b.im))


def neg(a: DDC) -> DDC:
    return DDC(dd.neg(a.re), dd.neg(a.im))


def conj(a: DDC) -> DDC:
    return DDC(a.re, dd.neg(a.im))


def mul(a: DDC, b: DDC) -> DDC:
    return DDC(dd.sub(dd.mul(a.re, b.re), dd.mul(a.im, b.im)),
               dd.add(dd.mul(a.re, b.im), dd.mul(a.im, b.re)))


def abs2(a: DDC) -> DD:
    """|a|² as a real DD."""
    return dd.add(dd.mul(a.re, a.re), dd.mul(a.im, a.im))


def div(a: DDC, b: DDC) -> DDC:
    """a / b via the conjugate: (a·conj b) / |b|²."""
    num = mul(a, conj(b))
    den = abs2(b)
    return DDC(dd.div(num.re, den), dd.div(num.im, den))


def div_real(a: DDC, s: DD) -> DDC:
    """a / s for real DD ``s``."""
    return DDC(dd.div(a.re, s), dd.div(a.im, s))


def abs1_hi(a: DDC):
    """LAPACK-style pivot magnitude ``|re| + |im|`` on the hi words (plain
    base-precision — selection needs no extended precision)."""
    return jnp.abs(a.re.hi) + jnp.abs(a.im.hi)


def where(cond, a: DDC, b: DDC) -> DDC:
    return DDC(DD(jnp.where(cond, a.re.hi, b.re.hi),
                  jnp.where(cond, a.re.lo, b.re.lo)),
               DD(jnp.where(cond, a.im.hi, b.im.hi),
                  jnp.where(cond, a.im.lo, b.im.lo)))
