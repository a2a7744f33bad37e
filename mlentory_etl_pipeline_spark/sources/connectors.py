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


def fake_post_transport(url: str, payload: str) -> str:
    """Deterministic offline POST transport for :func:`http_chunk_upload`
    — acknowledges with an ``ok`` status (a real deployment injects a
    ``requests.post``-backed callable with the same signature)."""
    return '{"status": "ok", "n_bytes": %d}' % len(payload)


def http_chunk_upload(
    lines: DataFrame,
    batch_id: str,
    base_url: str = "https://example.invalid/api",
    chunk_size: int = 1000,
    transport: Callable[[str, str], str] | None = None,
    policy: RetryPolicy | None = None,
    subject_col: str = "subject",
    line_col: str = "line",
) -> DataFrame:
    """S17 — remote chunked-HTTP sink (``LoadProcessor.py:343-526``):
    serialize the KG in ENTITY-ALIGNED chunks and POST each chunk to
    ``{base_url}/upload/chunk`` with batch/chunk bookkeeping, so the
    remote store ingests whole entities and a failed chunk retries
    without tearing the batch.

    Spark-first decomposition of the reference's sequential loop:

    1. chunk assignment is the V8 distributed prefix sum
       (:func:`~mlentory_etl_pipeline_spark.operators.versioned_store.entity_chunking`
       — whole subjects per chunk, no single-partition window);
    2. one payload row per chunk: lines sorted + newline-joined in a
       chunk-keyed aggregation (bounded by chunk_size × the 7-triple
       metadata fan-out — never a driver collect);
    3. the POST is a ``mapInPandas`` stage over the chunk-payload table
       (the :func:`fetch_urls` posture: injected transport, retry with
       exponential backoff, per-row error capture so one bad chunk
       never kills the batch). ``total_chunks`` rides as a 1-row
       in-plan broadcast.

    Returns one receipt per chunk: ``(chunk_id, n_lines, payload_md5,
    url, response, upload_error)``. Call :func:`finalize_batch` on the
    receipts to issue the batch-finalize / trigger-ETL POSTs (two
    driver-side calls, the reference's ``/finalize`` and
    ``/process-etl`` endpoints).
    """
    from mlentory_etl_pipeline_spark.operators.versioned_store import (
        entity_chunking,
    )

    transport = transport or fake_post_transport
    policy = policy or RetryPolicy()
    chunks = entity_chunking(
        lines.select(F.col(subject_col).alias("subject")),
        chunk_size=chunk_size,
    ).select("subject", "chunk_id")
    payloads = (
        lines.select(F.col(subject_col).alias("subject"), F.col(line_col).alias("_l"))
        .join(chunks, "subject")
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.concat_ws("\n", F.array_sort(F.collect_list("_l"))).alias("_payload"),
        )
    )
    total = payloads.agg(F.count(F.lit(1)).alias("_total"))
    requests_df = payloads.crossJoin(F.broadcast(total)).select(
        "chunk_id",
        "n_lines",
        F.md5(F.col("_payload")).alias("payload_md5"),
        F.concat(
            F.lit(f"{base_url.rstrip('/')}/upload/chunk?batch_id={batch_id}"),
            F.lit("&chunk_number="),
            F.col("chunk_id").cast("string"),
            F.lit("&total_chunks="),
            F.col("_total").cast("string"),
        ).alias("url"),
        "_payload",
    )
    out_schema = StructType(
        [
            StructField("chunk_id", requests_df.schema["chunk_id"].dataType),
            StructField("n_lines", requests_df.schema["n_lines"].dataType),
            StructField("payload_md5", StringType()),
            StructField("url", StringType()),
            StructField("response", StringType()),
            StructField("upload_error", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(url: str, payload: str):
            last = None
            for delay in [0.0, *policy.delays()]:
                if delay:
                    time.sleep(delay)
                try:
                    return transport(url, payload), None
                except TransientFetchError as e:
                    last = str(e)
                except Exception as e:
                    return None, str(e)
            return None, f"retries exhausted: {last}"

        for pdf in batches:
            results = [one(u, p) for u, p in zip(pdf["url"], pdf["_payload"])]
            out = pdf.drop(columns=["_payload"]).copy()
            out["response"] = [r[0] for r in results]
            out["upload_error"] = [r[1] for r in results]
            yield out

    return requests_df.mapInPandas(run, out_schema)


def finalize_batch(
    receipts: DataFrame,
    batch_id: str,
    base_url: str = "https://example.invalid/api",
    transport: Callable[[str, str], str] | None = None,
    trigger_etl: bool = True,
) -> dict:
    """Driver-side close of an :func:`http_chunk_upload` batch: verify
    every chunk receipt is clean (ONE aggregation — the receipts table
    is |chunks| rows, metadata), then POST ``/upload/batch/{id}/
    finalize`` and optionally ``/upload/process-etl/{id}``
    (``LoadProcessor.py:375-426``). Raises if any chunk failed —
    finalizing a partial batch is the reference's failure mode too."""
    transport = transport or fake_post_transport
    row = receipts.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.coalesce(
            F.sum(F.when(F.col("upload_error").isNotNull(), 1).otherwise(0)),
            F.lit(0),  # empty batch: zero failures, finalize the no-op
        ).alias("n_failed"),
    ).collect()[0]
    if row.n_failed:
        raise RuntimeError(
            f"batch {batch_id}: {row.n_failed}/{row.n_chunks} chunk uploads failed"
        )
    base = base_url.rstrip("/")
    result = {
        "batch_id": batch_id,
        "n_chunks": row.n_chunks,
        "finalize_response": transport(f"{base}/upload/batch/{batch_id}/finalize", ""),
    }
    if trigger_etl:
        result["etl_response"] = transport(
            f"{base}/upload/process-etl/{batch_id}", ""
        )
    return result


def landing_append(fetched: DataFrame, path: str, fetch_date: str) -> None:
    """S11-style landing-zone sink: append partitioned by fetch date so
    incremental refreshes prune to the newest partitions."""
    fetched.withColumn("fetch_date", F.lit(fetch_date)).write.mode("append").partitionBy(
        "fetch_date"
    ).parquet(path)
