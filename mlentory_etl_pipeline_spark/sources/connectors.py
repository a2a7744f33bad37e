"""API-connector plumbing (SURVEY §2.1 S2/S4/S5/S8/S10), offline-first.

The reference fetches from REST APIs with ThreadPoolExecutor fan-out,
retry/backoff honoring Retry-After, and per-batch pacing
(``HFDatasetManager.py:134-167,300-314``, ``OpenMLExtractor.py:189-206``).
The Spark-first shape (SURVEY §7.2 step 3): the *fetch* is a
``mapInPandas`` stage over a DataFrame of request keys — partition
parallelism replaces the thread pool, the transport is injected so
tests and the correctness gate never touch the network, and retry/
backoff lives in the connector, not the plan.

At scale: fetches land in a landing-zone table (append, partitioned by
fetch date); the incremental path is a watermark filter over that
table (``streaming/incremental.py``), so re-runs are idempotent and
downstream stages read parquet, never the API.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


class RetryPolicy:
    """Exponential backoff with bounded retries (the reference's
    policy: 6 retries, base 5 s, cap 400 s — scaled down by default
    here; deterministic, no jitter, so behavior is reproducible)."""

    def __init__(self, retries: int = 6, base_delay: float = 0.01, max_delay: float = 1.0):
        self.retries = retries
        self.base_delay = base_delay
        self.max_delay = max_delay

    def delays(self) -> Iterator[float]:
        for i in range(self.retries):
            yield min(self.base_delay * (2**i), self.max_delay)


class TransientFetchError(Exception):
    """Transport failure worth retrying (HTTP 429/5xx analogue)."""


def fake_transport(url: str) -> str:
    """Deterministic offline transport: the 'response' is a JSON echo
    derived from the URL. Stands in for urllib3/requests in tests and
    the correctness gate; a real deployment injects a genuine HTTP
    callable with the same signature."""
    return '{"url": "%s", "status": "ok"}' % url


def fetch_urls(
    requests_df: DataFrame,
    transport: Callable[[str], str] | None = None,
    url_col: str = "url",
    out_col: str = "response",
    policy: RetryPolicy | None = None,
) -> DataFrame:
    """S4/S5/S8/S10 connector core: one fetch per row via mapInPandas.

    Each partition runs sequentially through its rows (the reference's
    thread pool becomes partition parallelism — ``repartition(n)`` the
    request table to set the fan-out). Transient errors retry with
    exponential backoff; exhausted retries surface a null response plus
    the error message, so one bad key never kills the batch.
    """
    transport = transport or fake_transport
    policy = policy or RetryPolicy()
    fields = requests_df.schema.fields
    out_schema = StructType(
        list(fields)
        + [StructField(out_col, StringType()), StructField("fetch_error", StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(url: str):
            last = None
            for delay in [0.0, *policy.delays()]:
                if delay:
                    time.sleep(delay)
                try:
                    return transport(url), None
                except TransientFetchError as e:  # retry
                    last = str(e)
                except Exception as e:  # permanent
                    return None, str(e)
            return None, f"retries exhausted: {last}"

        for pdf in batches:
            pdf = pdf.copy()
            results = [one(u) for u in pdf[url_col]]
            pdf[out_col] = [r[0] for r in results]
            pdf["fetch_error"] = [r[1] for r in results]
            yield pdf

    return requests_df.mapInPandas(run, out_schema)


def croissant_requests(dataset_ids: DataFrame, id_col: str = "dataset_id") -> DataFrame:
    """S4 — request table for Croissant JSON-LD fetches
    (``GET /api/datasets/{id}/croissant``, ``HFDatasetManager.py:459-489``)."""
    return dataset_ids.select(
        F.col(id_col),
        F.concat(
            F.lit("https://huggingface.co/api/datasets/"),
            F.col(id_col).cast("string"),
            F.lit("/croissant"),
        ).alias("url"),
    )


def arxiv_requests(arxiv_ids: DataFrame, id_col: str = "arxiv_id", batch: int = 200) -> DataFrame:
    """S5 — arXiv batch request table: version suffixes stripped
    (``2106.09685v2 → 2106.09685``), ids grouped ``batch`` per request
    (the reference paces 200-id batches, ``HFDatasetManager.py:564-613``)."""
    norm = arxiv_ids.select(
        F.regexp_replace(F.col(id_col).cast("string"), r"v\d+$", "").alias("aid")
    ).distinct()
    # deterministic batching: rank ids, integer-divide by batch size
    from pyspark.sql import Window

    w = Window.orderBy("aid")
    batched = norm.withColumn("rn", F.row_number().over(w)).withColumn(
        "batch_no", ((F.col("rn") - 1) / batch).cast("int")
    )
    grouped = batched.groupBy("batch_no").agg(
        F.array_sort(F.collect_list("aid")).alias("ids")
    )
    return grouped.select(
        "batch_no",
        F.concat(
            F.lit("https://export.arxiv.org/api/query?id_list="),
            F.array_join("ids", ","),
        ).alias("url"),
    )


def landing_append(fetched: DataFrame, path: str, fetch_date: str) -> None:
    """S11-style landing-zone sink: append partitioned by fetch date so
    incremental refreshes prune to the newest partitions."""
    fetched.withColumn("fetch_date", F.lit(fetch_date)).write.mode("append").partitionBy(
        "fetch_date"
    ).parquet(path)
