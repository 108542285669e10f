"""Engine-portable pseudo-randomness (Spark Column + SQL-twin pairs).

Every stochastic-looking decision an oracle query must replay —
coloring priorities, cascade edge transmissions, factor inits — uses
these fixed LCG mixes in plain BIGINT arithmetic instead of engine
hash builtins, so Spark and any ANSI-SQL engine compute identical
values (both `%` operators truncate toward zero; inputs are folded
into range first so no multiply can overflow ANSI BIGINT).
"""

from __future__ import annotations

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
