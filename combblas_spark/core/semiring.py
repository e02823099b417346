"""Semiring abstraction — the central CombBLAS parameterization.

Reference: /root/reference/include/CombBLAS/Semirings.h:213-232 (PlusTimes),
:236-255 (MinPlus), :166-210 (SelectMax), :144-163 (Select2nd);
/root/reference/Applications/CC.h:62-84 (Select2ndMin used by LACC hooking).

In Spark a semiring is just a pair of Column expressions:
* ``mult(a, b)``  — applied to the joined row (the "multiply"),
* ``add(col)``    — the aggregate used in the groupBy (the "add").

Both stay entirely JVM-side (whole-stage codegen); no UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
import pyspark.sql.functions as F


@dataclass(frozen=True)
class Semiring:
    """(add, mult) pair parameterizing spmv/spgemm.

    ``mult`` combines the edge weight with the joined operand value;
    ``add`` reduces all contributions for one output key.
    """

    name: str
    mult: Callable[[Column, Column], Column]
    add: Callable[[Column], Column]


#: Standard arithmetic semiring — PageRank, SpGEMM numeric products.
PLUS_TIMES = Semiring("plus_times", lambda a, b: a * b, F.sum)

#: Tropical semiring — single-source shortest path relaxation.
MIN_PLUS = Semiring("min_plus", lambda a, b: a + b, F.min)

#: Max-times — widest-path style propagation.
MAX_TIMES = Semiring("max_times", lambda a, b: a * b, F.max)

#: Min-times.
MIN_TIMES = Semiring("min_times", lambda a, b: a * b, F.min)

#: Select the operand value (ignore edge weight), keep the minimum —
#: the LACC/FastSV hooking semiring (CC.h:62-84 Select2ndMinSR).
SELECT2ND_MIN = Semiring("select2nd_min", lambda a, b: b, F.min)

#: Select operand, keep maximum.
SELECT2ND_MAX = Semiring("select2nd_max", lambda a, b: b, F.max)

#: Boolean or-and — reachability / BFS frontier expansion.
BOOL_OR_AND = Semiring(
    "bool_or_and", lambda a, b: (a.cast("boolean") & b.cast("boolean")), F.max
)

#: Max-plus (the other tropical semiring) — longest-path / critical-path
#: propagation, e.g. triangular-solve level scheduling.
MAX_PLUS = Semiring("max_plus", lambda a, b: a + b, F.max)

#: Bottleneck semiring — widest-path / maximum-capacity relaxation:
#: a path's value is its narrowest edge, the best path the widest one.
MAX_MIN = Semiring("max_min", lambda a, b: F.least(a, b), F.max)
