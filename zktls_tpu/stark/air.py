"""AIR (algebraic intermediate representation) abstraction.

Replaces the reference's chip/AIR machinery (sp1-core-machine chips over
Plonky3 p3-air, SURVEY.md §2.2.B).  An AIR describes one table ("chip"):
its column count and a polynomial constraint evaluator written once and
executed over two algebras:

  * prover: values are `BBCol` wrappers around (N,)-shaped uint32 Montgomery
    arrays — constraints evaluate vectorized over the whole quotient domain
    on TPU, and `assert_zero` folds them into a single extension-field
    accumulator with powers of the challenge α;
  * verifier: values are host `Fp4` scalars at the out-of-domain point ζ —
    the same Python constraint code re-evaluates the fold for the DEEP-ALI
    consistency check.

Constraint selectors follow the Lagrange-selector scheme: the AIR multiplies
each constraint by `is_first_row` = Z_H(x)/(x−s), `is_last_row` =
Z_H(x)/(x−s·g^{n−1}) or `is_transition` = (x − s·g^{n−1}), and the prover
divides the folded sum by Z_H(x) = x^n − s^n once.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Sequence

import jax.numpy as jnp

from ..ops import babybear as bb
from ..ops import ext as ex
from ..ops.field_ref import Fp4, P

__all__ = ["Air", "BBCol", "FoldingBuilder", "AirBuilder"]


class BBCol:
    """Base-field column: a uint32 Montgomery array with field operators."""

    __slots__ = ("arr",)

    def __init__(self, arr):
        self.arr = arr

    @classmethod
    def const(cls, v: int, shape) -> "BBCol":
        m = (int(v) % P) * bb.MONT_R % P
        return cls(jnp.full(shape, m, dtype=jnp.uint32))

    def _lift(self, o) -> "BBCol":
        if isinstance(o, BBCol):
            return o
        if isinstance(o, int):
            return BBCol.const(o, self.arr.shape)
        raise TypeError(f"cannot lift {type(o)} to BBCol")

    def __add__(self, o):
        return BBCol(bb.add(self.arr, self._lift(o).arr))
    __radd__ = __add__

    def __sub__(self, o):
        return BBCol(bb.sub(self.arr, self._lift(o).arr))

    def __rsub__(self, o):
        return BBCol(bb.sub(self._lift(o).arr, self.arr))

    def __mul__(self, o):
        return BBCol(bb.mul(self.arr, self._lift(o).arr))
    __rmul__ = __mul__

    def __neg__(self):
        return BBCol(bb.neg(self.arr))


@dataclass
class AirBuilder:
    """The evaluation context handed to Air.eval.

    All members are algebra values (BBCol on the prover, Fp4 on the
    verifier); `assert_zero` folds α^i · expr into the accumulator via the
    injected fold function.  `periodic` holds the evaluations of the AIR's
    declared periodic columns (period-m patterns like SHA-256 round
    constants — untrusted commitment is unnecessary because the verifier
    evaluates the degree-<m interpolant itself at ζ^{n/m}).
    """

    local: Sequence[Any]
    next: Sequence[Any]
    public: Sequence[Any]
    is_first_row: Any
    is_last_row: Any
    is_transition: Any
    _fold: Callable[[Any], None]
    periodic: Sequence[Any] = ()
    constraint_count: int = 0

    def assert_zero(self, expr) -> None:
        self._fold(expr)
        self.constraint_count += 1

    def assert_eq(self, a, b) -> None:
        self.assert_zero(a - b)

    def assert_bool(self, a) -> None:
        self.assert_zero(a * (a - 1))

    def when_first_row(self, expr) -> None:
        self.assert_zero(self.is_first_row * expr)

    def when_last_row(self, expr) -> None:
        self.assert_zero(self.is_last_row * expr)

    def when_transition(self, expr) -> None:
        self.assert_zero(self.is_transition * expr)


class Air:
    """Base class for chips.  Subclasses set `width` (trace columns),
    `num_public` and implement eval(builder)."""

    width: int = 0
    num_public: int = 0
    #: max total degree of any asserted expression in the trace values
    #: (selector multipliers included).  Bounds the quotient degree; the
    #: prover checks it fits the configured blowup.
    max_constraint_degree: int = 3

    name: str = ""

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        if not cls.name:
            cls.name = cls.__name__

    def eval(self, builder: AirBuilder) -> None:  # pragma: no cover
        raise NotImplementedError

    def periodic_columns(self) -> list:
        """Fixed periodic column patterns: a list of numpy uint32 arrays,
        each a power-of-two length dividing every trace height this AIR is
        used with.  Available to eval() as builder.periodic."""
        return []

    def fold_constraints_scalar(self, local: Sequence[Fp4], nxt: Sequence[Fp4],
                                public: Sequence[int], sels: dict,
                                alpha: Fp4, periodic: Sequence[Fp4] = (),
                                ) -> Fp4:
        """Verifier-side: same fold at the out-of-domain point ζ."""
        acc = [Fp4(0)]
        alpha_pow = [Fp4(1)]

        def fold(expr):
            if not isinstance(expr, Fp4):
                expr = Fp4.from_base(expr)
            acc[0] = acc[0] + alpha_pow[0] * expr
            alpha_pow[0] = alpha_pow[0] * alpha

        builder = AirBuilder(
            local=list(local),
            next=list(nxt),
            public=[Fp4.from_base(v) for v in public],
            is_first_row=sels["is_first_row"],
            is_last_row=sels["is_last_row"],
            is_transition=sels["is_transition"],
            _fold=fold,
            periodic=list(periodic),
        )
        self.eval(builder)
        return acc[0]
