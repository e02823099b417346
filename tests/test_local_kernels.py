"""spmv_numpy must be metamorphically identical to the DataFrame spmv."""

import pyspark.sql.functions as F
import pytest

from combblas_spark.core.semiring import PLUS_TIMES, MIN_TIMES
from combblas_spark.operators.multiply import spmv
from combblas_spark.operators.local_kernels import spmv_numpy
from combblas_spark.sources.fixtures import sevenvertex
from tests.util import collect_vec


def _vec(spark, n):
    return spark.range(n).select("id", ((F.col("id") % 7) + 1.0).alias("val"))


def test_spmv_numpy_equals_dataframe_sum(spark):
    a = sevenvertex(spark)
    x = _vec(spark, 7)
    want = collect_vec(spmv(a, x, PLUS_TIMES))
    got = collect_vec(spmv_numpy(a, x, add="sum"))
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k])


def test_spmv_numpy_min_and_sparse_x(spark):
    a = sevenvertex(spark)
    x = spark.createDataFrame([(2, 1.0), (5, 2.0)], "id long, val double")
    want = collect_vec(spmv(a, x, MIN_TIMES))
    got = collect_vec(spmv_numpy(a, x, add="min"))
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k])


def test_spmv_numpy_reverse(spark):
    a = sevenvertex(spark)
    x = _vec(spark, 7)
    want = collect_vec(spmv(a, x, PLUS_TIMES, reverse=True))
    got = collect_vec(spmv_numpy(a, x, add="sum", reverse=True))
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k])
