"""In-plan pipeline metrics — the reference's runtime stats, Spark-first.

The reference collects per-SQL-statement timing/count stats in the DB
handler (``SQLHandler.py:257-272``) and per-phase wall-clock logs
(``GraphHandlerForKG.py:102-115``); SURVEY §4 maps these to "Spark
UI/listeners; keep a small metrics facade". This is that facade:

- :func:`observed` attaches named ``Observation`` metrics to a
  DataFrame — row counts, null counts, sums — computed *inside the
  existing action* (accumulator-backed, zero extra jobs, zero extra
  scans; a ``df.count()`` sanity check at 100 TB is a full second scan,
  an observation is free).
- :class:`PhaseTimer` wraps pipeline phases with wall-clock logging in
  the reference's ``"<phase> took N.NN seconds"`` shape.

Observations only fire when the DataFrame is acted on, and each
Observation instance is single-use — ``observed`` mints a fresh one
per call and returns it alongside the instrumented frame.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame,
    name: str,
    *metrics: Column,
    count_rows: bool = True,
    null_count_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, Observation]:
    """Attach an Observation computing the given aggregate expressions
    (plus a row count and optional per-column null counts) inside the
    next action on ``df``.

    Returns ``(instrumented_df, observation)``; read
    ``observation.get`` AFTER an action has run.

    >>> df, obs = observed(batch, "load_batch",
    ...                    F.sum("confidence").alias("total_conf"),
    ...                    null_count_cols=("object",))
    >>> store.load_batch(df)
    >>> obs.get  # {'n_rows': ..., 'total_conf': ..., 'null_object': ...}
    """
    exprs: list[Column] = []
    if count_rows:
        exprs.append(F.count(F.lit(1)).alias("n_rows"))
    exprs += [
        F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        for c in null_count_cols
    ]
    exprs += list(metrics)
    obs = Observation(name)
    return df.observe(obs, *exprs), obs


@dataclass
class PhaseTimer:
    """Per-phase wall-clock collector (the reference's load-phase logs,
    ``GraphHandlerForKG.py:102-115``), usable as a context manager
    factory: ``with timer.phase("transform"): ...``."""

    timings: dict[str, float] = field(default_factory=dict)

    def phase(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self._t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                timer.timings[name] = timer.timings.get(name, 0.0) + (
                    time.perf_counter() - self._t0
                )
                return False

        return _Ctx()

    def report(self) -> str:
        return "\n".join(
            f"{name} took {secs:.2f} seconds"
            for name, secs in self.timings.items()
        )
