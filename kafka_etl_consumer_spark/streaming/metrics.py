"""Ingest observability: a StreamingQueryListener capturing per-batch
throughput, the operational surface the reference lacks entirely (its only
visibility is log lines in the poll loop, ETLTask.java:259,283 of the
reference — no rates, no lag, nothing machine-readable).

``IngestMetricsListener`` records one row per completed micro-batch:
(query_name, batch_id, ts, num_input_rows, rows_per_sec, batch_duration_ms,
 state_rows). Attach with ``spark.streams.addListener``; read the rows from
``.records`` or land them with ``to_df(spark)`` for a metrics table —
at scale, write that DataFrame to a small parquet sink per hour and alert
off it (input-rate collapse and batch-duration creep are the two failure
smells of a landed-file pipeline).

Listener callbacks run on the driver's listener bus thread — O(1) work per
batch, no executor involvement, safe at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    query_name: str
    batch_id: int
    ts: str
    num_input_rows: int
    rows_per_sec: float
    batch_duration_ms: int
    state_rows: int


_SCHEMA = T.StructType(
    [
        T.StructField("query_name", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("rows_per_sec", T.DoubleType()),
        T.StructField("batch_duration_ms", T.LongType()),
        T.StructField("state_rows", T.LongType()),
    ]
)


class IngestMetricsListener(StreamingQueryListener):
    """Collects one :class:`BatchMetric` per completed micro-batch."""

    def __init__(self) -> None:
        self.records: list[BatchMetric] = []

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = 0
        for s in p.stateOperators or []:
            n = getattr(s, "numRowsTotal", 0)
            state_rows += int(n or 0)
        duration = int((p.durationMs or {}).get("triggerExecution", 0) or 0)
        self.records.append(
            BatchMetric(
                query_name=p.name or "",
                batch_id=int(p.batchId),
                ts=str(p.timestamp),
                num_input_rows=int(p.numInputRows or 0),
                rows_per_sec=float(p.processedRowsPerSecond or 0.0),
                batch_duration_ms=duration,
                state_rows=state_rows,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- reading the metrics ----------------------------------------------
    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (
                m.query_name,
                m.batch_id,
                m.ts,
                m.num_input_rows,
                m.rows_per_sec,
                m.batch_duration_ms,
                m.state_rows,
            )
            for m in self.records
        ]
        return spark.createDataFrame(rows, _SCHEMA)
