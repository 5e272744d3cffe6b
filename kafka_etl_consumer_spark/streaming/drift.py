"""Online drift detection over a stream: stateful Page-Hinkley and
decision-interval CUSUM monitors.

The Page-Hinkley batch twin is the ``ts_page_hinkley`` query
(plans/queries_pipeline41.py): cumulative deviation of each observation
from the RUNNING mean (tolerance ``delta``), alarm when the deviation
rises more than ``lam`` above its running minimum (Page 1954; the
default drift monitor in river/MOA). The streaming form keeps the
recurrence's state — (count, sum, u, min_u, max_ph, alarm stamp) — per
key in the state store, consumes observations in event-time order, and
re-emits the live statistic every micro-batch the key appears in, so a
sink/dashboard sees drift the batch it happens.

Parity contract (asserted in tests/test_stream_drift.py): fed the SAME
ordered series the batch query reduces (the 6dp-rounded daily means),
the final emission's ``max_ph``, ``drift_detected`` and ``alarm_seq``
equal the batch query's answer — both sides accumulate sum-then-divide
running means over identical sequences, so the doubles agree to the 6dp
the contract rounds to.

Scale: state is six scalars per key — O(#keys), event volume only
streams through; the shuffle is on the key column. The per-observation
loop runs over one micro-batch's rows for one key inside an Arrow
batch (pandas), the same cost class as every applyInPandasWithState
operator here. Reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["page_hinkley_monitor", "page_hinkley_monitor_tws", "cusum_monitor"]


def page_hinkley_monitor(
    df: DataFrame,
    key_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "m",
    delta: float = 0.1,
    lam: float = 5.0,
) -> DataFrame:
    """Per-key streaming Page-Hinkley state machine (increase direction).

    Emits one row per key per micro-batch it appears in:
    ``(key, n_obs, ph, max_ph, drift_detected, alarm_seq)`` where
    ``ph`` is the statistic after the batch's last observation,
    ``max_ph`` its historical peak, and ``alarm_seq`` the 1-based
    observation index of the FIRST crossing (0 while undetected —
    the streaming stand-in for the batch twin's alarm_day).

    Observations are applied in ``ts_col`` order within each batch;
    cross-batch order is the arrival order (late data is the stream's
    problem — put a watermark-deduped, time-bucketed aggregation in
    front if observations can arrive out of order)."""
    import pandas as pd  # local import: streaming module stays light
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("n_obs", T.LongType()),
            T.StructField("ph", T.DoubleType()),
            T.StructField("max_ph", T.DoubleType()),
            T.StructField("drift_detected", T.BooleanType()),
            T.StructField("alarm_seq", T.LongType()),
        ]
    )
    # n, sum_x, u, min_u, max_ph, alarm_seq — sum (not incremental mean)
    # so the running mean is sum/n exactly like the batch window avg
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("sum_x", T.DoubleType()),
            T.StructField("u", T.DoubleType()),
            T.StructField("min_u", T.DoubleType()),
            T.StructField("max_ph", T.DoubleType()),
            T.StructField("alarm_seq", T.LongType()),
        ]
    )

    def update(key, pdfs, state):
        if state.exists:
            n, sum_x, u, min_u, max_ph, alarm = state.get
        else:
            n, sum_x, u, min_u, max_ph, alarm = 0, 0.0, 0.0, 0.0, 0.0, 0
        ph = max_ph
        # One key's micro-batch can span several Arrow chunks (rows >
        # arrow.maxRecordsPerBatch); sorting per-chunk would fold
        # observations in shuffle order across chunk boundaries. Concat
        # first (bounded by one key's micro-batch) then sort ONCE so the
        # in-batch event-time ordering contract holds regardless of
        # chunking.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        batch = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1
            else (chunks[0] if chunks else None)
        )
        if batch is not None:
            for x in batch.sort_values(ts_col, kind="mergesort")[value_col]:
                n += 1
                sum_x += float(x)
                u += float(x) - sum_x / n - delta
                min_u = min(min_u, u)
                ph = u - min_u
                max_ph = max(max_ph, ph)
                if alarm == 0 and ph > lam:
                    alarm = n
        state.update((n, sum_x, u, min_u, max_ph, alarm))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_obs": [n],
                "ph": [ph],
                "max_ph": [max_ph],
                "drift_detected": [alarm > 0],
                "alarm_seq": [alarm],
            }
        )

    return (
        df.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(ts_col),
            F.col(value_col),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def page_hinkley_monitor_tws(
    df: DataFrame,
    key_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "m",
    delta: float = 0.1,
    lam: float = 5.0,
) -> DataFrame:
    """:func:`page_hinkley_monitor` on the ``transformWithStateInPandas``
    API (Spark 4.x arbitrary-state v2) — same recurrence, same state
    layout (one ValueState of six scalars per key), same output contract,
    so tests/test_stream_drift.py asserts both paths emit identical final
    state. Same env gate as ``running_totals_tws``: the v2 state server
    speaks protobuf and needs the RocksDB state store provider, so the
    parity test self-skips where the lib is absent (CAPABILITIES.md)."""
    import pandas as pd  # local import: streaming module stays light
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("n_obs", T.LongType()),
            T.StructField("ph", T.DoubleType()),
            T.StructField("max_ph", T.DoubleType()),
            T.StructField("drift_detected", T.BooleanType()),
            T.StructField("alarm_seq", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("sum_x", T.DoubleType()),
            T.StructField("u", T.DoubleType()),
            T.StructField("min_u", T.DoubleType()),
            T.StructField("max_ph", T.DoubleType()),
            T.StructField("alarm_seq", T.LongType()),
        ]
    )

    class _PageHinkley(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ph", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, sum_x, u, min_u, max_ph, alarm = self._state.get()
            else:
                n, sum_x, u, min_u, max_ph, alarm = 0, 0.0, 0.0, 0.0, 0.0, 0
            ph = max_ph
            # Same chunk-spanning contract as update() above: concat all
            # Arrow chunks for this key before the single event-time sort.
            chunks = [pdf for pdf in rows if len(pdf)]
            batch = (
                pd.concat(chunks, ignore_index=True) if len(chunks) > 1
                else (chunks[0] if chunks else None)
            )
            if batch is not None:
                for x in batch.sort_values(ts_col, kind="mergesort")[value_col]:
                    n += 1
                    sum_x += float(x)
                    u += float(x) - sum_x / n - delta
                    min_u = min(min_u, u)
                    ph = u - min_u
                    max_ph = max(max_ph, ph)
                    if alarm == 0 and ph > lam:
                        alarm = n
            self._state.update((n, sum_x, u, min_u, max_ph, alarm))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n_obs": [n],
                    "ph": [ph],
                    "max_ph": [max_ph],
                    "drift_detected": [alarm > 0],
                    "alarm_seq": [alarm],
                }
            )

        def close(self) -> None:
            pass

    return (
        df.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(ts_col),
            F.col(value_col),
        )
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=_PageHinkley(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def cusum_monitor(
    df: DataFrame,
    key_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "m",
    target: float = 49.0,
    slack: float = 0.25,
    h: float = 3.0,
) -> DataFrame:
    """Per-key streaming one-sided (increase) CUSUM in Page's
    decision-interval form: S_t = max(0, S_{t-1} + (x_t - target -
    slack)), alarm when S_t > h — the fixed-target complement to
    :func:`page_hinkley_monitor`'s running-mean drift (CUSUM detects a
    shift ABOVE a known reference level; PH detects a shift relative to
    the series' own history). State uses the same running-sum-minus-
    running-min closed form as PH (S_t = U_t - min(0, min_j U_j) with
    U_t the prefix sum of deviations), so the batch twin
    ``ts_cusum_oneside`` reduces the identical recurrence with prefix
    windows and tests/test_stream_drift.py asserts exact final-state
    parity on the same rounded daily series.

    Emits one row per key per micro-batch it appears in:
    ``(key, n_obs, s, max_s, drift_detected, alarm_seq)``; alarm_seq is
    the 1-based index of the FIRST threshold crossing (0 while
    undetected). Observations apply in ``ts_col`` order within each
    micro-batch (all Arrow chunks concatenated first — same contract as
    the PH monitor); cross-batch order is arrival order.

    Scale: five scalars of state per key; the only shuffle keys on the
    monitored series."""
    import pandas as pd  # local import: streaming module stays light
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("n_obs", T.LongType()),
            T.StructField("s", T.DoubleType()),
            T.StructField("max_s", T.DoubleType()),
            T.StructField("drift_detected", T.BooleanType()),
            T.StructField("alarm_seq", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("u", T.DoubleType()),
            T.StructField("min_u", T.DoubleType()),
            T.StructField("max_s", T.DoubleType()),
            T.StructField("alarm_seq", T.LongType()),
        ]
    )

    def update(key, pdfs, state):
        if state.exists:
            n, u, min_u, max_s, alarm = state.get
        else:
            n, u, min_u, max_s, alarm = 0, 0.0, 0.0, 0.0, 0
        s = max_s
        chunks = [pdf for pdf in pdfs if len(pdf)]
        batch = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1
            else (chunks[0] if chunks else None)
        )
        if batch is not None:
            for x in batch.sort_values(ts_col, kind="mergesort")[value_col]:
                n += 1
                u += float(x) - target - slack
                min_u = min(min_u, u)
                s = u - min_u
                max_s = max(max_s, s)
                if alarm == 0 and s > h:
                    alarm = n
        state.update((n, u, min_u, max_s, alarm))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_obs": [n],
                "s": [s],
                "max_s": [max_s],
                "drift_detected": [alarm > 0],
                "alarm_seq": [alarm],
            }
        )

    return (
        df.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(ts_col),
            F.col(value_col),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
