from combblas_spark.operators.multiply import spmv, spgemm, square  # noqa: F401
from combblas_spark.operators.ewise import (  # noqa: F401
    ewise_mult,
    set_difference,
    ewise_apply_vec,
)
from combblas_spark.operators.reduce import reduce_dim, load_imbalance  # noqa: F401
from combblas_spark.operators.transform import (  # noqa: F401
    transpose,
    symmetrize,
    remove_loops,
    add_loops,
    dimapply,
    apply_values,
    prune,
    prune_column,
)
from combblas_spark.operators.kselect import kselect, prune_recovery_select  # noqa: F401
from combblas_spark.operators.indexing import (  # noqa: F401
    subsref,
    spasgn,
    vec_gather,
    vec_assign,
    vec_set,
    invert,
    uniq,
)
