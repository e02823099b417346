"""combblas_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query semantics of CombBLAS (PASSIONLab, sparse linear
algebra over semirings — see /root/reference/include/CombBLAS/SpParMat.h:67)
as idiomatic Spark DataFrame plans:

* a distributed sparse matrix  -> an edge DataFrame  (src, dst, w)
* a distributed (sparse) vector -> a vertex DataFrame (id, val)
* a semiring multiply           -> equi-join + groupBy aggregate
* masking / elementwise ops     -> semi / anti / outer joins
* iterative algorithms          -> driver superstep loops with
                                   per-superstep checkpointing

Nothing here is a port of the MPI execution engine; Catalyst + AQE play the
role of SUMMA scheduling, broadcast-vs-alltoall adaptivity and multiway
merge (partial aggregation).
"""

__version__ = "0.1.0"

from combblas_spark.core.semiring import (  # noqa: F401
    Semiring,
    PLUS_TIMES,
    MIN_PLUS,
    MAX_TIMES,
    MIN_TIMES,
    SELECT2ND_MIN,
    SELECT2ND_MAX,
    BOOL_OR_AND,
)
