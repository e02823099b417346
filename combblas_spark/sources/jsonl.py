"""JSONL corpus ingest/egress — the interchange format LLM training
pipelines actually ship (one JSON document per line: The Pile, RedPajama,
Dolma, FineWeb all distribute as jsonl/jsonl.zst).

Reference parallel: ReadGeneralizedTuples / ParallelReadMM
(/root/reference/src/SpParMat.cpp:3895-3984, :3722-3885) are the
reference's "parse a text interchange format in parallel, quarantine
nothing, crash on malformed" readers. At 10^12-file corpus scale a
crash-on-first-bad-line reader is useless — real crawls contain truncated
lines, invalid UTF-8 escapes, and schema drift — so this reader makes the
malformed-row policy explicit and returns the bad lines as DATA.

Scale rules encoded here:

* **Schema is mandatory.** `spark.read.json` without a schema runs a full
  extra inference pass over the input (100 TB read twice) and silently
  widens drifting types. Callers pass the expected schema; drift lands in
  quarantine instead of corrupting the table.
* **PERMISSIVE + columnNameOfCorruptRecord** keeps parsing JVM-side
  (Jackson inside the scan operator — no Python in the row path, per the
  repo-wide no-per-row-UDF rule) and yields exactly one extra string
  column holding the verbatim bad line.
* The corrupt-record split **caches the parsed frame once**: Spark
  forbids filtering a raw JSON scan on the corrupt column alone
  (SPARK-21610 — the pushed-down filter would race the parser), and
  without a cache the good/bad split would re-read + re-parse the input
  twice anyway.
* Egress writes gzip-compressed part files only when asked; the default
  is uncompressed because .gz is NOT splittable — a 1 GB .gz part forces
  a single-task read downstream. Parquet (sources/bucketed.py) remains
  the engine-internal format; this is the interchange boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
import pyspark.sql.types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "PERMISSIVE",
) -> tuple[DataFrame, DataFrame]:
    """Parse JSONL at ``path`` against an explicit ``schema``.

    Returns ``(good, quarantine)``:

    * ``good`` — rows that parsed cleanly, exactly the caller's schema.
    * ``quarantine`` — one row per malformed/drifted input line,
      ``(line string)``: the verbatim text, ready to write to a
      bad-records sink or count against an ingest SLA.

    ``mode='FAILFAST'`` raises on the first malformed line instead
    (strict-ingest acceptance runs); ``mode='DROPMALFORMED'`` silently
    drops them (quarantine comes back empty by construction).
    """
    if mode not in ("PERMISSIVE", "FAILFAST", "DROPMALFORMED"):
        raise ValueError(f"unknown mode {mode!r}")
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not declare {CORRUPT_COL!r}")
    if mode != "PERMISSIVE":
        good = spark.read.schema(schema).option("mode", mode).json(path)
        return good, spark.createDataFrame(
            [], T.StructType([T.StructField("line", T.StringType())])
        )
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()  # one parse feeds both halves; also SPARK-21610
    )
    bad = F.col(CORRUPT_COL).isNotNull()
    good = parsed.filter(~bad).drop(CORRUPT_COL)
    quarantine = parsed.filter(bad).select(F.col(CORRUPT_COL).alias("line"))
    return good, quarantine


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write ``df`` as JSONL part files (one JSON object per line,
    UTF-8, no pretty-printing — the format read_jsonl accepts).

    ``compression``: None (splittable, default), 'gzip' (smaller, NOT
    splittable — fine for hand-off, wrong for re-ingest at scale).
    """
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
