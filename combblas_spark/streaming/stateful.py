"""Custom stateful streaming operators (applyInPandasWithState).

The reference's closest analog is the incremental pipeline that carries
clustering state across batch updates (/root/reference/Applications/
Incremental/IncClust.h); in Structured Streaming the idiomatic carrier for
custom per-key state is ``applyInPandasWithState`` — Arrow-batched, no
per-row Python.

``streaming_dedup_exact``: emit only the FIRST occurrence of each document
digest across the whole stream. State is sharded by
``xxhash64(digest) % n_shards`` — each shard's group state holds the set of
digests it has seen, so state size and update cost partition evenly across
the cluster's state store; n_shards is the state-parallelism knob (use
O(cores) locally, O(executors x cores) on a cluster). All Arrow chunks of a
micro-batch group are concatenated before the winner is picked, so the
smallest id wins per digest WITHIN a micro-batch (matching the batch
oracle); across micro-batches the contract is first-seen.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 64,
) -> DataFrame:
    """Stateful exact dedup over a streaming document DataFrame.

    Returns (id_col, digest) rows for first-seen documents only; duplicates
    of anything seen in ANY earlier micro-batch are dropped. The batch-mode
    oracle is functions.dedup.dedup_exact (min-id winner per digest).
    """
    out_schema = f"{id_col} long, digest string"
    state_schema = "seen array<string>"

    def dedupe(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        # concatenate the group's chunks FIRST: min-id-wins must hold across
        # the whole micro-batch, not per Arrow chunk (the shard's batch is
        # bounded, so the concat is)
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(id_col).drop_duplicates("digest", keep="first")
            fresh = pdf[~pdf["digest"].isin(seen)]
            if len(fresh):
                seen.update(fresh["digest"].tolist())
                yield fresh[[id_col, "digest"]]
        state.update((sorted(seen),))

    keyed = docs.select(
        F.col(id_col),
        F.sha2(F.col(text_col).cast("binary"), 256).alias("digest"),
    ).withColumn("shard", F.pmod(F.xxhash64("digest"), F.lit(n_shards)))
    return keyed.groupBy("shard").applyInPandasWithState(
        dedupe,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _rowlocal_band_buckets(
    docs: DataFrame,
    k: int,
    num_hashes: int,
    bands: int,
    rows_per_band: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, band, bucket) — the SAME band-bucket keys as the batch
    functions.dedup pipeline (shingles -> minhash -> sorted-band md5), but
    computed entirely ROW-LOCALLY as Column expressions over the shingle
    array: streaming append mode forbids the batch path's pre-state
    aggregations, and per-doc minhash needs no cross-row state anyway.
    Docs with no k-shingle emit no row (matching batch, where they reach
    no bucket)."""
    from combblas_spark.functions.text import tokens_col

    t = tokens_col(F.col(text_col))
    n = F.size(t)
    sh = F.when(
        n >= k,
        F.array_distinct(
            F.filter(
                F.transform(
                    F.sequence(F.lit(0), n - k),
                    lambda i: F.array_join(F.slice(t, i + 1, k), " "),
                ),
                lambda s: s != "",
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    docs = docs.withColumn("_sh", sh).filter(F.size("_sh") > 0)
    mins = [
        F.array_min(
            F.transform(
                F.col("_sh"),
                lambda s, seed=seed: F.md5(
                    F.concat_ws("|", F.lit(str(seed)), s)
                ),
            )
        )
        for seed in range(num_hashes)
    ]
    buckets = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        F.sort_array(
                            F.array(*mins[b * rows_per_band : (b + 1) * rows_per_band])
                        ),
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return docs.select(
        F.col(id_col).alias("id"), F.explode(buckets).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def streaming_near_dups(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 4,
    bands: int = 2,
    rows_per_band: int = 2,
    max_bucket: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stateful MinHash-LSH near-dup candidate detection over a streaming
    document DataFrame: emits (band, id_a, id_b) the moment the SECOND
    member of an LSH band bucket arrives — the cross-batch analog of
    functions.dedup.lsh_candidate_pairs, with identical bucket keys (a
    pair may appear once per shared band; batch mode's .distinct() is a
    downstream concern for append streams).

    State per (band, bucket) group is the member-id list, capped at
    ``max_bucket``: once a bucket fills, later arrivals are dropped from it
    (append mode cannot retract already-emitted pairs, so the cap bounds
    forward emission — the batch guard drops the whole degenerate bucket;
    under the cap the two modes agree exactly, asserted by the pytest
    batch-equality oracle).
    """
    out_schema = "band int, id_a long, id_b long"
    state_schema = "members array<long>, closed boolean"

    def detect(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band = int(key[0])
        members, closed = (
            (list(state.get[0]), bool(state.get[1])) if state.exists else ([], False)
        )
        chunks = [p for p in pdfs if len(p)]
        if chunks and not closed:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            new_ids = sorted(set(pdf["id"].tolist()) - set(members))
            pairs = []
            for nid in new_ids:
                if len(members) >= max_bucket:
                    closed = True
                    break
                pairs.extend(
                    (band, min(m, nid), max(m, nid)) for m in members
                )
                members.append(nid)
            if pairs:
                yield pd.DataFrame(pairs, columns=["band", "id_a", "id_b"])
        state.update((members, closed))

    keyed = _rowlocal_band_buckets(
        docs, k, num_hashes, bands, rows_per_band, id_col, text_col
    )
    return keyed.groupBy("band", "bucket").applyInPandasWithState(
        detect,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
