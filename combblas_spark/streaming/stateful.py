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


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 21600,
    close_by_watermark: bool = False,
) -> DataFrame:
    """Stateful cross-batch sessionization — the streaming twin of
    functions.sessions.sessionize, same rollup contract: emitted rows are
    (user_id, session_id, n_events, start_us, end_us, n_types,
    value_milli) for every session CLOSED by a later event; the newest
    session per user stays open in state.

    ``close_by_watermark=True`` additionally closes stragglers: the open
    session arms an event-time timeout at ``end + gap`` — once the
    watermark passes it (no in-gap event can still arrive), the session
    is emitted and its state REMOVED, so an idle user costs nothing in
    the state store. Requires ``events.withWatermark('ts', ...)``
    upstream (Spark's precondition for EventTimeTimeout). With the flag
    off, the batch-equality tests compare against the batch output minus
    each user's final (still-open) session.

    State per user is ONE open-session summary (constant size: counters +
    the distinct-type set), so the state store grows with active users,
    not with events. Within a micro-batch the gap/boundary logic is the
    same vectorized cumsum the batch operator uses (no per-row loop);
    events are assumed in event-time order ACROSS micro-batches (enforce
    upstream with a watermark — same in-order contract as the batch
    window). Key by user_id: the same single-exchange shape as batch.
    """
    out_schema = (
        "user_id long, session_id long, n_events long, start_us long, "
        "end_us long, n_types long, value_milli long"
    )
    state_schema = (
        "session_id long, start_us long, end_us long, n_events long, "
        "value_milli long, types array<string>"
    )
    gap_us = int(gap_seconds) * 1_000_000

    def roll(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if close_by_watermark and state.hasTimedOut:
            # watermark passed end + gap: no in-gap event can still arrive,
            # the open session is final — emit it and free the state slot
            sid0, st0, en0, n0, vm0, ty0 = state.get
            (uid,) = key
            state.remove()
            yield pd.DataFrame(
                [{
                    "user_id": int(uid), "session_id": sid0, "n_events": n0,
                    "start_us": st0, "end_us": en0,
                    "n_types": len(set(ty0)), "value_milli": vm0,
                }]
            )
            return
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            # state untouched; nothing to emit
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
        us = pdf["ts"].astype("datetime64[us]").astype("int64")
        import numpy as np

        vmilli = np.floor(pdf["value"].to_numpy() * 1000).astype("int64")
        # vectorized boundary flags within the batch (same rule as batch)
        brk = (us.diff().fillna(gap_us + 1) > gap_us).astype("int64")
        local = brk.cumsum() - 1  # 0-based local session index
        agg = pd.DataFrame(
            {"local": local, "us": us, "vm": vmilli, "ty": pdf["event_type"]}
        ).groupby("local", sort=True).agg(
            n=("us", "size"),
            start=("us", "min"),
            end=("us", "max"),
            vm=("vm", "sum"),
            ty=("ty", lambda s: set(s)),
        )
        (uid,) = key
        closed = []  # (sid, n, start, end, n_types, vm)
        if state.exists:
            sid0, st0, en0, n0, vm0, ty0 = state.get
            first = agg.iloc[0]
            if int(us.iloc[0]) - en0 <= gap_us:
                # first local session continues the open one: merge
                merged_ty = set(ty0) | first["ty"]
                agg.iat[0, agg.columns.get_loc("n")] = n0 + first["n"]
                agg.iat[0, agg.columns.get_loc("start")] = min(st0, first["start"])
                agg.iat[0, agg.columns.get_loc("end")] = max(en0, first["end"])
                agg.iat[0, agg.columns.get_loc("vm")] = vm0 + first["vm"]
                agg.iat[0, agg.columns.get_loc("ty")] = merged_ty
                base = sid0  # local 0 keeps the open session's id
            else:
                closed.append((sid0, n0, st0, en0, len(set(ty0)), vm0))
                base = sid0 + 1
        else:
            base = 1
        # every local session except the last closes within this batch
        for loc, row in agg.iloc[:-1].iterrows():
            closed.append(
                (base + int(loc), int(row["n"]), int(row["start"]),
                 int(row["end"]), len(row["ty"]), int(row["vm"]))
            )
        last_loc = int(agg.index[-1])
        last = agg.iloc[-1]
        state.update(
            (base + last_loc, int(last["start"]), int(last["end"]),
             int(last["n"]), int(last["vm"]), sorted(last["ty"]))
        )
        if close_by_watermark:
            # arm the straggler close: fire once the watermark (ms) passes
            # the last event + gap
            state.setTimeoutTimestamp(int(last["end"]) // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                [
                    {
                        "user_id": int(uid), "session_id": sid, "n_events": n,
                        "start_us": st, "end_us": en, "n_types": nt,
                        "value_milli": vm,
                    }
                    for sid, n, st, en, nt, vm in closed
                ]
            )

    keyed = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        "ts", "event_id", "event_type", "value",
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        roll,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if close_by_watermark
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_heavy_hitters(
    docs: DataFrame,
    threshold: int = 100,
    capacity: int = 100_000,
    n_shards: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Stateful cross-batch token heavy hitters: emit (token, cnt) ONCE,
    in the micro-batch where a token's RUNNING corpus count first reaches
    ``threshold`` (append mode; ``cnt`` is the running count at crossing,
    >= threshold and <= the final corpus count).

    State shards by xxhash64(token) % n_shards — each shard holds its own
    (token -> count) map plus the already-emitted set, so state size and
    update cost spread evenly like streaming_dedup_exact. ``capacity``
    bounds each shard's map (space-saving style: over capacity the
    smallest (count, token) entries are evicted — counts for evicted
    tokens restart, the standard memory/recall trade; size shards so
    vocabulary/n_shards stays under capacity for exact behavior, the
    regime the batch-equality pytest pins down).
    """
    from combblas_spark.functions.text import tokens_col

    out_schema = "token string, cnt long"
    state_schema = "toks array<string>, cnts array<long>, emitted array<string>"

    def track(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            toks, cnts, emitted = state.get
            counts = dict(zip(toks, cnts))
            em = set(emitted)
        else:
            counts, em = {}, set()
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            )
            for tok, c in pdf.groupby("token").size().items():
                counts[tok] = counts.get(tok, 0) + int(c)
            if len(counts) > capacity:
                keep = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
                counts = dict(keep[:capacity])
            fresh = sorted(
                (t, c)
                for t, c in counts.items()
                if c >= threshold and t not in em
            )
            if fresh:
                em.update(t for t, _ in fresh)
                yield pd.DataFrame(fresh, columns=["token", "cnt"])
        toks_s = sorted(counts)
        state.update((toks_s, [counts[t] for t in toks_s], sorted(em)))

    exploded = docs.select(
        F.explode(tokens_col(F.col(text_col))).alias("token")
    ).withColumn("shard", F.pmod(F.xxhash64("token"), F.lit(n_shards)))
    return exploded.groupBy("shard").applyInPandasWithState(
        track,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    window_seconds: int | None = None,
) -> DataFrame:
    """Stateful cross-batch funnel — the streaming twin of
    functions.sessions.funnel, same earliest-completion semantics: a user
    completes step i at the MIN event time of type ``steps[i]`` strictly
    after (and, with ``window_seconds``, within the per-hop window of)
    their step i-1 completion. Emits ONE row per step ADVANCE:
    (user_id, step_idx 1-based, step, at_us) — aggregate downstream for
    the funnel counts (append mode cannot restate counts, completions are
    the streamable form of the same fact).

    State per user is two longs (next step index, last completion time)
    — constant size, so the state store grows with users, not events.
    Within a micro-batch the advance loop runs per STEP (at most
    len(steps) vectorized masks over the user's batch slice), never per
    event. Events are assumed in event-time order ACROSS micro-batches
    (same watermark contract as streaming_sessionize); within a batch
    order does not matter — qualifying times are reduced with min().
    """
    if not steps:
        raise ValueError("streaming_funnel needs at least one step")
    out_schema = "user_id long, step_idx long, step string, at_us long"
    state_schema = "next_idx long, t_prev long"
    win_us = None if window_seconds is None else int(window_seconds) * 1_000_000

    def advance(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        us = pdf["ts"].astype("datetime64[us]").astype("int64")
        types = pdf["event_type"]
        next_idx, t_prev = (state.get if state.exists else (0, -1))
        (uid,) = key
        emitted = []
        while next_idx < len(steps):
            mask = types == steps[next_idx]
            if next_idx > 0:
                mask &= us > t_prev
                if win_us is not None:
                    mask &= us <= t_prev + win_us
            cand = us[mask]
            if not len(cand):
                break
            t_prev = int(cand.min())
            next_idx += 1
            emitted.append(
                {
                    "user_id": int(uid),
                    "step_idx": next_idx,
                    "step": steps[next_idx - 1],
                    "at_us": t_prev,
                }
            )
        state.update((int(next_idx), int(t_prev)))
        if emitted:
            yield pd.DataFrame(emitted)

    keyed = events.select(
        F.col("user_id").cast("long").alias("user_id"), "ts", "event_type"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        advance,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_ewma(
    counts: DataFrame,
    group_col: str = "g",
    period_col: str = "period",
    x_col: str = "x",
    thresh_num: int = 1,
    thresh_den: int = 2,
) -> DataFrame:
    """Stateful streaming twin of functions.sessions.ewma_drift: the
    ALL-INTEGER alpha=1/2 EWMA drift alarm advanced across
    micro-batches.

    Per-group state is just ``(t, N, last)`` — the period index, the
    exact int64 scaled level N_t, and the last period seen — so the
    stream carries the WHOLE monitoring history in three scalars per
    key (the keep-sketches-not-data shape again). Emits exactly the
    batch operator's rows; equality with the batch run over the
    concatenated input is the pytest oracle. Periods must arrive in
    order per group (a regression to an already-consumed period raises
    — EWMA state cannot be rewound) and the 62-period int64 shift
    budget raises like the batch twin.
    """
    out_schema = (
        f"{group_col} string, t long, {period_col} string, "
        f"{x_col} long, num_prev long, alert long"
    )
    state_schema = "t long, n long, last string"

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        t, n_acc, last = state.get if state.exists else (0, 0, "")
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            ).sort_values(period_col)
            out = []
            for period, x in zip(pdf[period_col], pdf[x_col]):
                if last and str(period) <= last:
                    raise ValueError(
                        f"streaming_ewma: out-of-order period {period!r} "
                        f"after {last!r} in group {key[0]!r}"
                    )
                t += 1
                if t > 62:
                    raise ValueError(
                        f"streaming_ewma: > 62 periods in group {key[0]!r}"
                    )
                w = 1 if t == 1 else 1 << (t - 2)
                wx = int(x) * w
                alert = int(
                    t >= 2 and abs(wx - n_acc) * thresh_den > thresh_num * n_acc
                )
                out.append((key[0], t, str(period), int(x), n_acc, alert))
                n_acc += wx
                last = str(period)
            yield pd.DataFrame(
                out,
                columns=[group_col, "t", period_col, x_col,
                         "num_prev", "alert"],
            )
        state.update((t, n_acc, last))

    return counts.groupBy(group_col).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_cusum(
    counts: DataFrame,
    k_ref: int,
    group_col: str = "g",
    period_col: str = "period",
    x_col: str = "x",
    h_mult: int = 2,
) -> DataFrame:
    """Stateful streaming twin of functions.sessions.cusum_alarm with
    an explicit reference level ``k_ref`` (control-chart practice —
    the stream cannot know its own future mean, so k comes from a
    training window).

    Per-group state is ``(p, rmin, last)``: the running prefix sum of
    deviations, the running min of that prefix (seeded at 0 for the
    implicit P_0), and the last period seen — the closed form
    S_t = P_t - min(0, min P_i) advanced incrementally, all exact
    int64. Emits exactly the batch operator's rows; out-of-order
    periods raise (CUSUM state cannot be rewound).
    """
    out_schema = (
        f"{group_col} string, {period_col} string, {x_col} long, "
        "k long, s long, alarm long"
    )
    state_schema = "p long, rmin long, last string"
    k = int(k_ref)
    h = int(h_mult)

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        p, rmin, last = state.get if state.exists else (0, 0, "")
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            ).sort_values(period_col)
            out = []
            for period, x in zip(pdf[period_col], pdf[x_col]):
                if last and str(period) <= last:
                    raise ValueError(
                        f"streaming_cusum: out-of-order period {period!r} "
                        f"after {last!r} in group {key[0]!r}"
                    )
                p += int(x) - k
                rmin = min(rmin, p)
                s = p - min(0, rmin)
                out.append(
                    (key[0], str(period), int(x), k, s, int(s > h * k))
                )
                last = str(period)
            yield pd.DataFrame(
                out,
                columns=[group_col, period_col, x_col, "k", "s", "alarm"],
            )
        state.update((p, rmin, last))

    return counts.groupBy(group_col).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
