"""2D grid (SUMMA-style) vector exchange for large-vector supersteps.

Reference: CombBLAS lays the matrix on a sqrt(p) x sqrt(p) process grid and
replicates the SpMV operand along the grid column with AllGatherVector
(/root/reference/include/CombBLAS/ParFriends.h:1884-1942, CommGrid.h); the
result is reduced along the grid row (Alltoallv + MergeContributions,
ParFriends.h:2011). This module is that layout done with Spark shuffles:

* the edge table is hash-banded into an R x C grid by
  (xxhash(src) % R, xxhash(dst) % C) and partitioned so each band-pair IS
  one Spark partition (band -> partition alignment via murmur3 tokens);
  the cached edge table never moves again;
* per superstep the vector is replicated C times (the AllGather analog,
  but done as a parallel shuffle, not a driver-built broadcast), joined
  co-partitioned (zero edge movement, ShuffledHashJoin probe), and reduced
  by dst — the partial aggregate per partition is bounded by the partition's
  dst band (|V|/C), so the reduce shuffle moves at most R*|V| rows.

WHY: a driver-built broadcast of a |V|-row vector is the serial fraction
that caps N->4N scaling efficiency (measured 0.60 at scale 22 in round 1);
with the grid exchange every per-superstep byte moves through the parallel
shuffle path and efficiency is bounded only by per-job overhead. Use
broadcast (operators.multiply.spmv broadcast_x=True) when the vector is
small; use the grid when it is not. `spmv_grid` picks R*C partitions, so
size the grid so |E|/(R*C) edges fit one task comfortably.

Band->partition alignment: Spark's HashPartitioning places key k in
partition pmod(murmur3(k), NP). We pick NP integer tokens whose murmur3
hashes land in NP distinct partitions (a one-time driver search) and tag
every edge with the token of its band — each band then maps to exactly one
partition (measured imbalance 1.04 on RMAT scale 22 vs 4.1 for naive
(rb, cb) hash partitioning, where 32 band-pairs collide into ~25 of 64
partitions).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.core.semiring import Semiring, PLUS_TIMES


def _partition_tokens(spark: SparkSession, num_partitions: int) -> list[int]:
    """token[b] hashes (murmur3, the HashPartitioning hash) into partition b.

    Tokens are INT (4-byte) — the pid column is the hottest shuffled column
    at scale, and murmur3(int) != murmur3(long), so the search and the tag
    must agree on the type (both int, here and in _tok_array)."""
    rows = spark.range(0, max(4096, num_partitions * 64)).select(
        F.col("id"),
        F.pmod(F.hash(F.col("id").cast("int")), F.lit(num_partitions)).alias("b"),
    ).collect()
    tok: dict[int, int] = {}
    for r in rows:
        tok.setdefault(r["b"], r["id"])
        if len(tok) == num_partitions:
            break
    if len(tok) != num_partitions:
        raise RuntimeError(f"token search exhausted at {len(tok)}/{num_partitions}")
    return [int(tok[b]) for b in range(num_partitions)]


def auto_grid_shape(
    spark: SparkSession, n_edges: int, rows_per_task: int = 150_000
) -> tuple[int, int]:
    """(R, C) sized from the edge count: R*C ≈ clamp(|E|/rows_per_task, 4,
    2*defaultParallelism), aspect ratio R ≈ 4C (replication C stays low).

    Rationale: the grid's per-superstep cost has a fixed component per
    partition (task launch, C-fold vector replication), so a toy input on a
    64-partition grid pays 64 partitions of overhead for microseconds of
    work. Large inputs clamp to 2x parallelism — at RMAT scale 24 on 32
    cores this returns the protocol (16, 4) grid unchanged, while the sf0.1
    ps graph (1.18M edges) gets (8, 1): measured 10.1s vs 22.9s on the
    fixed (16, 4) grid for pagerank_grid_ps.
    """
    p_max = max(4, 2 * spark.sparkContext.defaultParallelism)
    p = max(4, min(p_max, -(-n_edges // rows_per_task)))
    c = max(1, int((p / 4) ** 0.5))
    r = max(1, p // c)
    return (r, c)


@dataclass
class Grid2D:
    """R x C band grid; one band-pair per Spark partition."""

    spark: SparkSession
    R: int = 8
    C: int = 4
    _tokens: list[int] = field(default_factory=list)

    def __post_init__(self):
        self._tokens = _partition_tokens(self.spark, self.R * self.C)
        # subset-key co-partitioning (join on (pid, src) reusing the edge
        # table's HashPartitioning(pid)) requires this off (it is Spark's
        # pessimistic default); runtime-settable SQL conf.
        self.spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")

    @property
    def num_partitions(self) -> int:
        return self.R * self.C

    def _tok_array(self) -> Column:
        return F.array(*[F.lit(t).cast("int") for t in self._tokens])

    def band_of(self, src: Column, dst: Column) -> Column:
        """Partition token for edge (src, dst)."""
        idx = (F.pmod(F.xxhash64(src), F.lit(self.R)) * self.C
               + F.pmod(F.xxhash64(dst), F.lit(self.C)) + 1).cast("int")
        return F.element_at(self._tok_array(), idx)

    def partition_edges(self, edges: DataFrame, with_w: bool = True,
                        sort: bool = True) -> DataFrame:
        """Band-tag + partition the edge table (caller persists). The layout
        is computed once; every superstep reuses it with zero edge movement.

        ``sort`` orders each partition by (pid, src): the per-superstep hash
        probe then walks the build table in key order (consecutive edges hit
        the same bucket), which cuts the cache-miss inflation that otherwise
        appears when many cores probe large hash tables concurrently — a
        one-time layout cost paid at build, like the reference's CSC sort
        (SpParMat.cpp column-major tuples)."""
        cols = ["src", "dst"] + (["w"] if with_w else [])
        tagged = edges.select(*cols, self.band_of(F.col("src"), F.col("dst")).alias("pid"))
        out = tagged.repartition(self.num_partitions, "pid")
        return out.sortWithinPartitions("pid", "src") if sort else out

    def replicate_vector(self, x: DataFrame) -> DataFrame:
        """C copies of x(id, val), each tagged with one column band's pid —
        the AllGatherVector analog as a parallel shuffle of C*|x| rows."""
        idx = (F.pmod(F.xxhash64("id"), F.lit(self.R)) * self.C + F.col("_cb") + 1).cast("int")
        return (
            x.withColumn("_cb", F.explode(F.array(*[F.lit(i).cast("long") for i in range(self.C)])))
            .withColumn("pid", F.element_at(self._tok_array(), idx))
            .drop("_cb")
            .hint("shuffle_hash")  # build side = the vector slice, never the edges
        )


def spmv_grid(
    e_grid: DataFrame, x: DataFrame, grid: Grid2D, sr: Semiring = PLUS_TIMES
) -> DataFrame:
    """y[dst] = add_{(s,d) in E} mult(w, x[s]) with the 2D grid exchange.

    ``e_grid`` must come from ``grid.partition_edges`` (cached by the
    caller). Plan shape per superstep: one shuffle of C*|x| replicated
    vector rows, a co-partitioned ShuffledHashJoin (edges cached in place),
    partial agg bounded by the partition's dst band, and a final reduce of
    <= R*|V| partial rows. No driver-side broadcast build — every byte
    moves through the parallel shuffle path.

    ``x.id`` MUST have the same type as ``e_grid.src``: band assignment
    hashes the raw column bytes (xxhash64(int) != xxhash64(long)), so a
    type mismatch silently lands vector rows in the wrong band and the
    join drops them.
    """
    x_t = dict(x.dtypes)["id"]
    e_t = dict(e_grid.dtypes)["src"]
    if x_t != e_t:
        raise TypeError(
            f"spmv_grid: x.id is {x_t} but e_grid.src is {e_t}; band hashing "
            "is type-sensitive — cast both sides to the same type"
        )
    xr = grid.replicate_vector(x)
    w = e_grid["w"] if "w" in e_grid.columns else F.lit(1.0)
    j = e_grid.join(xr, on=[e_grid["pid"] == xr["pid"], e_grid["src"] == xr["id"]])
    return (
        j.groupBy(e_grid["dst"].alias("id"))
        .agg(sr.add(sr.mult(w, xr["val"])).alias("val"))
    )
