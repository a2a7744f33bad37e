"""N-Triples as a first-class Spark data source (Python DataSource
API, Spark 4).

The reference treats `.nt` files as its graph interchange surface —
`MlentoryTransform.py:145-155` serializes them, the Virtuoso loader
(`LoadProcessor.py` bulk path) consumes them. Here the format gets the
idiomatic Spark treatment instead of ad-hoc text munging on either
end: `spark.read.format("ntriples").load(dir)` and
`df.write.format("ntriples").save(dir)` work like any built-in source,
with the engine's internal triple model
`(subject, predicate, object, object_is_uri)` — the same columns
`graph.to_ntriples` consumes, so the source round-trips the engine's
own serialization exactly (including the `"` → `\\"` literal escape).

Scale posture:
- one ``InputPartition`` per `.nt` file → files read in parallel
  across executors, the same unit of parallelism as the text source;
- ``pushFilters`` accepts equality on ``predicate``/``subject`` and
  ``object_is_uri`` and applies them DURING the parse (rows are
  dropped before they ever reach the JVM — for a predicate-selective
  scan this is the difference between shipping the whole graph and
  shipping one property's rows);
- the reader yields Arrow ``RecordBatch``es (the zero-copy Python→JVM
  path), batched at ``BATCH_ROWS`` rows;
- the writer writes one part file per task and commits a `_SUCCESS`
  marker from the driver, matching the usual Hadoop-ish contract
  (task files are uniquely named, so speculative/retried tasks cannot
  interleave).

Malformed-line contract: lines that are blank or `#` comments are
skipped; anything else that fails the grammar raises (fail-fast — a
silent skip would corrupt a graph diff downstream).
"""

from __future__ import annotations

import os
import re
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

BATCH_ROWS = 8192

# <s> <p> <o> .   |   <s> <p> "literal" .
_LINE = re.compile(
    r'^<([^>]*)> <([^>]*)> (?:<([^>]*)>|"((?:[^"\\]|\\.)*)") \.$'
)

SCHEMA = "subject string, predicate string, object string, object_is_uri boolean"

# Literal escaping: backslash FIRST on write (quote-only escaping
# serialized a trailing backslash as "...\" — unparseable), and a real
# escape-sequence decoder on read (\\ \" \n \r \t — the N-Triples
# string escapes external producers emit).
_ESCAPES = (
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
)
_UNESCAPE_RE = re.compile(r"\\(.)")
_UNESCAPE_MAP = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}


def _escape_literal(s: str) -> str:
    for find, repl in _ESCAPES:
        s = s.replace(find, repl)
    return s


def _unescape_literal(s: str) -> str:
    if "\\" not in s:
        return s
    return _UNESCAPE_RE.sub(
        lambda m: _UNESCAPE_MAP.get(m.group(1), m.group(1)), s
    )


@dataclass
class _FilePartition(InputPartition):
    path: str


@dataclass
class _PartFile(WriterCommitMessage):
    path: str


def _nt_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".nt")
        )
    return [path]


class NTriplesReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ntriples source requires a path")
        self.eq: dict[str, object] = {}

    def pushFilters(self, filters):
        # equality on parse-time columns is applied inside read();
        # everything else is evaluated by Spark above us
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and len(f.attribute) == 1
                and f.attribute[0] in ("subject", "predicate", "object_is_uri")
            ):
                self.eq[f.attribute[0]] = f.value
            else:
                yield f

    def partitions(self):
        return [_FilePartition(p) for p in _nt_files(self.path)]

    def read(self, partition):
        import pyarrow as pa

        want_s = self.eq.get("subject")
        want_p = self.eq.get("predicate")
        want_u = self.eq.get("object_is_uri")
        s_l: list[str] = []
        p_l: list[str] = []
        o_l: list[str] = []
        u_l: list[bool] = []

        def flush():
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(s_l, pa.string()),
                    pa.array(p_l, pa.string()),
                    pa.array(o_l, pa.string()),
                    pa.array(u_l, pa.bool_()),
                ],
                names=["subject", "predicate", "object", "object_is_uri"],
            )

        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                m = _LINE.match(line)
                if not m:
                    raise ValueError(
                        f"malformed N-Triples line in {partition.path}: {line!r}"
                    )
                s, p, o_uri, o_lit = m.groups()
                is_uri = o_uri is not None
                if want_s is not None and s != want_s:
                    continue
                if want_p is not None and p != want_p:
                    continue
                if want_u is not None and is_uri != want_u:
                    continue
                s_l.append(s)
                p_l.append(p)
                o_l.append(o_uri if is_uri else _unescape_literal(o_lit))
                u_l.append(is_uri)
                if len(s_l) >= BATCH_ROWS:
                    yield flush()
                    s_l, p_l, o_l, u_l = [], [], [], []
        if s_l:
            yield flush()


class NTriplesWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ntriples sink requires a path")
        if overwrite and os.path.isdir(self.path):
            for f in os.listdir(self.path):
                if f.endswith(".nt") or f == "_SUCCESS":
                    os.remove(os.path.join(self.path, f))
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.nt")
        tmp = part + ".inprogress"
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                o = (
                    f"<{row.object}>"
                    if row.object_is_uri
                    else '"' + _escape_literal(row.object) + '"'
                )
                fh.write(f"<{row.subject}> <{row.predicate}> {o} .\n")
                n += 1
        if n:
            os.replace(tmp, part)
        else:
            os.remove(tmp)
        return _PartFile(part if n else "")

    def commit(self, messages):
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("")

    def abort(self, messages):
        for m in messages:
            if m is not None and m.path and os.path.exists(m.path):
                os.remove(m.path)


class NTriplesDataSource(DataSource):
    """`spark.dataSource.register(NTriplesDataSource)` then
    `spark.read.format("ntriples")` / `df.write.format("ntriples")`."""

    @classmethod
    def name(cls) -> str:
        return "ntriples"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return NTriplesReader(self.options)

    def simpleStreamReader(self, schema):
        return NTriplesStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        return NTriplesWriter(self.options, overwrite)


def register(spark) -> None:
    # implementing pushFilters() requires the (off-by-default) Python
    # filter-pushdown conf; it is a runtime SQL conf, safe to flip here
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(NTriplesDataSource)


def _parse_nt_rows(path: str):
    """Yield (subject, predicate, object, object_is_uri) tuples from
    one N-Triples file — the row-tuple twin of NTriplesReader.read's
    Arrow batches, shared by the streaming reader (streaming's simple
    API is tuple-based)."""
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            m = _LINE.match(line)
            if not m:
                raise ValueError(
                    f"malformed N-Triples line in {path}: {line!r}"
                )
            s, p, o_uri, o_lit = m.groups()
            is_uri = o_uri is not None
            yield (
                s,
                p,
                o_uri if is_uri else _unescape_literal(o_lit),
                is_uri,
            )


class NTriplesStreamReader(SimpleDataSourceStreamReader):
    """Landing-zone tail as a STREAMING source (Spark 4 simple stream
    reader API): the offset is ``{"idx": n}`` — how many files of the
    SORTED directory listing have been consumed — so each micro-batch
    reads exactly the files that appeared since the last one. This is
    the incremental graph-ingest path (reference: the extractor drops
    .nt dumps into a directory; the loader should pick up only new
    ones) expressed through Structured Streaming's offset contract:
    deterministic replay between any two offsets, exactly-once when
    paired with an idempotent sink (the SCD2 merge).

    Files must be immutable once written and named monotonically (the
    writer's part-file scheme satisfies both); appends to an already-
    consumed file are NOT picked up — the file, not the byte, is the
    unit of progress.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ntriples stream source requires a path")

    def initialOffset(self):
        return {"idx": 0}

    def read(self, start):
        files = _nt_files(self.path)
        idx = int(start["idx"])
        # a LIST, not a generator: the simple-API runner caches the
        # batch with copy.copy for replay (generators can't be copied).
        # Materializing on the driver is the simple reader's documented
        # trade — the unit of progress is a landing FILE, sized by the
        # upstream chunker (entity_chunking), not the corpus.
        rows = [r for f in files[idx:] for r in _parse_nt_rows(f)]
        return rows, {"idx": len(files)}

    def readBetweenOffsets(self, start, end):
        files = _nt_files(self.path)
        return [
            r
            for f in files[int(start["idx"]) : int(end["idx"])]
            for r in _parse_nt_rows(f)
        ]

    def commit(self, end):
        pass
