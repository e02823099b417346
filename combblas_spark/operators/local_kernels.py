"""Vectorized numpy local kernels — the LocalSpMV analog.

Reference: /root/reference/include/CombBLAS/ParFriends.h:1943 (LocalSpMV)
and the SpMSpV kernels (SpImpl.h:51-101): after the column-world allgather
replicates the vector, each process multiplies ITS LOCAL BLOCK with a tight
sequential kernel. Our DataFrame spmv's hash-join probe is that step done
by Tungsten; this module is the drop-to-numpy fast path for the regime
where the vector fits in memory and the per-row hash probe dominates:

    y_partial[dst] = add(w * x[src])  per partition, via numpy gather +
    np.bincount / np.minimum.at — Arrow-batched, no per-row Python.

Semantics are identical to operators.multiply.spmv (metamorphic test);
use it in benchmark/throughput paths. The x vector rides to executors as a
SparkContext broadcast of two numpy arrays (ids, values) — the literal
AllGatherVector.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def _to_numpy_vec(x: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    pdf = x.select("id", "val").toPandas()
    ids = pdf["id"].to_numpy(dtype=np.int64)
    vals = pdf["val"].to_numpy(dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    return ids[order], vals[order]


def broadcast_vec(spark: SparkSession, x: DataFrame):
    """Collect (id, val) once and ship it as a SparkContext broadcast of two
    sorted numpy arrays — build it ONCE per vector and pass to spmv_numpy
    via ``x_bc`` when running several products against the same x (the
    per-call toPandas round-trip is the AllGather; don't pay it twice)."""
    return spark.sparkContext.broadcast(_to_numpy_vec(x))


def spmv_numpy(
    edges: DataFrame,
    x: DataFrame | None,
    add: str = "sum",
    reverse: bool = False,
    x_bc=None,
) -> DataFrame:
    """y[dst] = add_{(s,d)} w * x[s] with add in {sum, min, max}.

    Dense-gather local kernel: per Arrow batch, positions of src in the
    broadcast (sorted) id array are found with np.searchsorted, the
    multiply is one vectorized expression, and the per-partition partial
    reduction is np.bincount (sum) or np.minimum/maximum.at on the batch's
    compacted output domain. A final groupBy merges partials across
    partitions — tiny, since each partition emits at most its distinct dst.
    Rows whose src is absent from x contribute nothing (sparse semantics).
    """
    if add not in ("sum", "min", "max"):
        raise ValueError(add)
    join_key, out_key = ("src", "dst") if not reverse else ("dst", "src")
    spark = edges.sparkSession
    b = x_bc if x_bc is not None else broadcast_vec(spark, x)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bids, bvals = b.value
        for pdf in batches:
            src = pdf[join_key].to_numpy(dtype=np.int64)
            dst = pdf[out_key].to_numpy(dtype=np.int64)
            w = pdf["w"].to_numpy(dtype=np.float64)
            pos = np.searchsorted(bids, src)
            pos_c = np.clip(pos, 0, len(bids) - 1)
            hit = (len(bids) > 0) & (bids[pos_c] == src)
            if not hit.any():
                yield pd.DataFrame({"id": np.empty(0, np.int64), "val": np.empty(0, np.float64)})
                continue
            contrib = w[hit] * bvals[pos_c[hit]]
            d = dst[hit]
            # compact the output domain for bincount/at
            uniq, inv = np.unique(d, return_inverse=True)
            if add == "sum":
                out = np.bincount(inv, weights=contrib, minlength=len(uniq))
            elif add == "min":
                out = np.full(len(uniq), np.inf)
                np.minimum.at(out, inv, contrib)
            else:
                out = np.full(len(uniq), -np.inf)
                np.maximum.at(out, inv, contrib)
            yield pd.DataFrame({"id": uniq, "val": out})

    partials = edges.mapInPandas(kernel, schema="id long, val double")
    agg = {"sum": F.sum, "min": F.min, "max": F.max}[add]
    return partials.groupBy("id").agg(agg("val").alias("val"))
