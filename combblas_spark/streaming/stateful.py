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
