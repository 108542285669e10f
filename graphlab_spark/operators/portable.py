"""Engine-portable pseudo-randomness (Spark Column + SQL-twin pairs).

Every stochastic-looking decision an oracle query must replay —
coloring priorities, cascade edge transmissions, factor inits — uses
these fixed LCG mixes in plain BIGINT arithmetic instead of engine
hash builtins, so Spark and any ANSI-SQL engine compute identical
values (both `%` operators truncate toward zero; inputs are folded
into range first so no multiply can overflow ANSI BIGINT).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

M = 2_147_483_648  # 2^31
A = 1_103_515_245
C = 12_345
FOLD = 65_599


def lcg_hash(col: Column | str) -> Column:
    """Two LCG rounds mod 2^31 of an integer column."""
    col = F.col(col) if isinstance(col, str) else col
    x = (col % M + M) % M
    x = (x * A + C) % M
    return (x * A + C) % M


def sql_lcg_hash(expr: str) -> str:
    x1 = f"(({expr} % {M} + {M}) % {M})"
    x2 = f"(({x1} * {A} + {C}) % {M})"
    return f"(({x2} * {A} + {C}) % {M})"


def edge_hash(u: Column | str, v: Column | str) -> Column:
    """Order-sensitive hash of an integer pair (fold-then-mix)."""
    u = F.col(u) if isinstance(u, str) else u
    v = F.col(v) if isinstance(v, str) else v
    hu = (u % M + M) % M
    hv = (v % M + M) % M
    return lcg_hash(hu * FOLD + hv)


def sql_edge_hash(u: str, v: str) -> str:
    hu = f"(({u} % {M} + {M}) % {M})"
    hv = f"(({v} % {M} + {M}) % {M})"
    return sql_lcg_hash(f"({hu} * {FOLD} + {hv})")


def mix31(col: Column | str) -> Column:
    """Multiply-xor-shift avalanche over a 31-bit value (input must be
    in [0, 2^31)): three multiplies with two xor-shifts between them.
    Plain LCG strides are visibly periodic across adjacent seeds (they
    broke the FM-bit geometry); the xor-shifts break the stride."""
    x = F.col(col) if isinstance(col, str) else col
    x = (x * 69_069 + 12_345) % M
    x = x.bitwiseXOR(F.shiftright(x, 13))
    x = (x * A + C) % M
    x = x.bitwiseXOR(F.shiftright(x, 17))
    return (x * 69_069 + 1) % M


def sql_mix31(expr: str) -> str:
    """SQL twin of mix31 — NOTE: textually inlines the input expression
    8x; feed it a plain column reference, not a nested expression."""
    x1 = f"(({expr} * 69069 + 12345) % {M})"
    x2 = f"xor({x1}, {x1} >> 13)"
    x3 = f"(({x2} * {A} + {C}) % {M})"
    x4 = f"xor({x3}, {x3} >> 17)"
    return f"(({x4} * 69069 + 1) % {M})"


def unit_interval(col: Column | str) -> Column:
    """lcg_hash mapped into [0, 1) as DOUBLE (exact binary fraction)."""
    return lcg_hash(col) / F.lit(float(M))


def sql_unit_interval(expr: str) -> str:
    return f"({sql_lcg_hash(expr)} / {float(M)!r})"


# -- portable standard-normal CDF (A&S 7.1.26, as the reference's
#    cdf.hpp uses verbatim) -------------------------------------------

PHI_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027,
         1.061405429)
PHI_P = 0.3275911
INV_SQRT_2PI = 0.3989422804014327  # 1/sqrt(2*pi)


def phi_cdf(col: Column) -> Column:
    """Standard-normal CDF by the Abramowitz-Stegun 7.1.26 erf
    polynomial — the exact formula and constants of the reference's
    ``cdf.hpp:29-50`` — so Spark and any SQL engine replaying the
    same arithmetic agree to the last printed digit."""
    sign = F.when(col < 0, -1.0).otherwise(1.0)
    x = F.abs(col) / F.lit(math.sqrt(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(PHI_P) * x)
    a1, a2, a3, a4, a5 = PHI_A
    y = F.lit(1.0) - (((((F.lit(a5) * t + F.lit(a4)) * t) + F.lit(a3))
                       * t + F.lit(a2)) * t + F.lit(a1)) * t \
        * F.exp(-x * x)
    return F.lit(0.5) * (F.lit(1.0) + sign * y)


def sql_phi(expr: str) -> str:
    """SQL twin of phi_cdf — inlines ``expr`` several times; feed it a
    plain column reference."""
    a1, a2, a3, a4, a5 = PHI_A
    sign = f"(CASE WHEN {expr} < 0 THEN -1.0 ELSE 1.0 END)"
    x = f"(abs({expr}) / sqrt(2.0))"
    t = f"(1.0 / (1.0 + {PHI_P!r} * {x}))"
    y = (f"(1.0 - ((((({a5!r} * {t} + {a4!r}) * {t}) + {a3!r}) * {t} "
         f"+ {a2!r}) * {t} + {a1!r}) * {t} * exp(-{x} * {x}))")
    return f"(0.5 * (1.0 + {sign} * {y}))"
