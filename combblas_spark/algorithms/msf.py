"""Minimum spanning forest — Borůvka hook-and-contract.

The classic linear-algebra MSF (Awerbuch-Shiloach hooking, the same
machinery as the CC family: /root/reference/Applications/CC.h:1194
ConditionalHook / :1331 Shortcut analogs; per-component argmin is the
Select2ndMin-style reduction of /root/reference/Applications/CC.h:62-84,
here over a (w, a, b) struct). Per round:

1. every component picks its minimum outgoing edge under the TOTAL order
   (w ASC, a ASC, b ASC) — ties broken by canonical endpoint ids, so the
   forest is unique and any correct MSF algorithm (the pytest's Kruskal
   oracle, the unrolled SQL replay) produces the identical edge set;
2. chosen edges join the forest; the component hook digraph (out-degree
   1) can only contain 2-cycles (both endpoints of a globally-minimal
   edge pick it — the distinct-weights classic), broken by rooting the
   smaller component id;
3. pointer jumping (parent = parent[parent]) contracts every hook tree
   to its root in O(log depth) steps;
4. components relabel and only still-CROSS edges survive to the next
   round (the edge table shrinks monotonically, like kcore's peel).

O(log V) rounds; each is two vertex-keyed joins over the surviving edge
table + comp-sized hook processing. The per-round vector is O(V) like
cc_fastsv — lineage truncated per round, no forced broadcasts.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.plans.superstep import SuperstepRunner


def boruvka_msf(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 25,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """(a, b, w) — the unique minimum spanning forest of the UNDIRECTED
    graph ``edges`` (src, dst, w; pass a symmetric or one-direction table,
    both work) under the total edge order (w, a, b), a = min endpoint,
    b = max endpoint. Parallel (a, b) multi-edges keep their minimum w.

    |forest| = n_vertices - n_components rows.
    """
    import warnings

    runner = runner or SuperstepRunner(spark)
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("w").cast("double").alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    # fold the edge count into the materializing action (one job), so the
    # emptiness checks cost no separate isEmpty pass per round
    und, row = runner.truncate_agg(und, F.count(F.lit(1)).alias("n"))
    n_edges = int(row["n"] or 0)
    verts = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .distinct()
    )
    comp = runner.truncate(verts.select("id", F.col("id").alias("comp")))
    forest = None

    for _ in range(max_rounds):
        if n_edges == 0:
            break
        # attach component labels to the canonical edges (two O(V)-keyed
        # hash joins — the cc superstep shape), keep cross edges only
        ca = comp.select(F.col("id").alias("a"), F.col("comp").alias("ca"))
        cb = comp.select(F.col("id").alias("b"), F.col("comp").alias("cb"))
        ce, row = runner.truncate_agg(
            und.join(ca, on="a")
            .join(cb, on="b")
            .filter(F.col("ca") != F.col("cb")),
            F.count(F.lit(1)).alias("n"),
        )
        n_edges = int(row["n"] or 0)
        # survivors are the next round's edge table (intra edges can never
        # become cross again — monotone shrink)
        und = ce.select("a", "b", "w")
        if n_edges == 0:
            # no cross edge anywhere: contraction is complete; the rest of
            # the round body would be a chain of no-ops
            break
        # per-component argmin over both endpoints' views of each edge:
        # min(struct) is the deterministic Select2ndMin-style reduction
        both = ce.select(
            F.col("ca").alias("c"), F.col("cb").alias("d"), "w", "a", "b"
        ).unionByName(
            ce.select(
                F.col("cb").alias("c"), F.col("ca").alias("d"), "w", "a", "b"
            )
        )
        hooks = (
            both.groupBy("c")
            .agg(F.min(F.struct("w", "a", "b", "d")).alias("m"))
            .select(
                "c",
                F.col("m.d").alias("d"),
                F.col("m.w").alias("w"),
                F.col("m.a").alias("a"),
                F.col("m.b").alias("b"),
            )
        )
        hooks = hooks.persist()
        # the round's forest increment is checkpointed once; the running
        # forest is a plain union of checkpointed terms (flat lineage) —
        # the old re-truncate rewrote the WHOLE forest every round
        new_forest = runner.truncate(hooks.select("a", "b", "w").distinct())
        forest = (
            new_forest if forest is None else forest.unionByName(new_forest)
        )
        # hook digraph: parent[c] = d, except 2-cycles (mutual picks of one
        # globally-minimal edge) root at the SMALLER component id
        h2 = hooks.select("c", "d")
        mutual = (
            h2.alias("x")
            .join(
                h2.alias("y"),
                on=(F.col("x.c") == F.col("y.d")) & (F.col("x.d") == F.col("y.c")),
                how="left_semi",
            )
            .select("c", "d")
        )
        parent = h2.join(
            mutual.select("c").withColumn("_mut", F.lit(True)), on="c", how="left"
        ).select(
            "c",
            F.when(
                F.col("_mut").isNotNull() & (F.col("c") < F.col("d")), F.col("c")
            )
            .otherwise(F.col("d"))
            .alias("p"),
        )
        # components with no cross edge keep themselves as parent
        allc = comp.select(F.col("comp").alias("c")).distinct()
        parent = runner.truncate(
            allc.join(parent, on="c", how="left").select(
                "c", F.coalesce("p", "c").alias("p")
            )
        )
        hooks.unpersist()
        # pointer jumping to roots (log depth; hook forests are acyclic
        # after the 2-cycle break) — the moved flag is computed inline and
        # truncate_agg folds it into the materializing job: ONE action per
        # jump instead of checkpoint + old-vs-new join
        while True:
            jumped, jrow = runner.truncate_agg(
                parent.alias("x")
                .join(
                    parent.select(
                        F.col("c").alias("p"), F.col("p").alias("pp")
                    ),
                    on="p",
                )
                .select(
                    "c",
                    F.col("pp").alias("p"),
                    (F.col("pp") != F.col("p")).cast("long").alias("_moved"),
                ),
                F.sum("_moved").alias("m"),
            )
            parent = jumped.select("c", "p")
            if int(jrow["m"] or 0) == 0:
                break
        # lazy cut: the relabeled comp materializes inside the next round's
        # cross-edge truncate_agg action
        comp = runner.truncate_lazy(
            comp.join(
                parent.select(F.col("c").alias("comp"), F.col("p").alias("root")),
                on="comp",
            ).select("id", F.col("root").alias("comp"))
        )
    else:
        if n_edges > 0:
            warnings.warn(
                f"boruvka_msf: round budget {max_rounds} exhausted before "
                "contraction completed — forest is PARTIAL",
                stacklevel=2,
            )

    if forest is None:
        schema = "a long, b long, w double"
        return spark.createDataFrame([], schema)
    return forest
