"""Custom stateful streaming operator: incremental sessionization.

The batch sessionizer (operators/relational.py) needs the whole history;
a stream can't re-sort the past. ``applyInPandasWithState`` keeps one
tiny state row per key — (session_start, last_ts, n_events) — and emits
a session row when the event-time gap closes it (watermark-driven
timeout). This is rung (b) of the custom-operator ladder: semantics
Spark's built-ins can't express (session_window exists, but not with
custom merge/emit logic), state bounded to one row per live key.

At scale: state store traffic is O(live keys) per micro-batch, not
O(events); the watermark bounds both state size and result lateness.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "container_id string, session_start long, session_end long, n_events long"
)
STATE_SCHEMA = "start long, last long, n long"

def make_session_fn(gap_us: int):
    """Build the per-key state-update function (ts values in µs)."""

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (container_id,) = key
        closed: list[tuple[str, int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((container_id, start, last, n))
                state.remove()
            yield pd.DataFrame(
                closed, columns=["container_id", "session_start",
                                 "session_end", "n_events"])
            return

        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend(int(t) for t in pdf["ts_us"])
        ts_all.sort()

        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts_all[0], ts_all[0] - 1, 0

        for t in ts_all:
            if t >= last:
                if t - last > gap_us and n > 0:
                    closed.append((container_id, start, last, n))
                    start, n = t, 0
                last = t
                n += 1
            elif t >= start - gap_us:
                # late arrival (within watermark) extending the open
                # session backward
                start = min(start, t)
                n += 1
            else:
                # too early to merge: a one-off session already implied
                # closed by the gap
                closed.append((container_id, t, t, 1))
        state.update((start, last, n))
        # close the open session once the watermark passes last+gap;
        # clamp above the current watermark (a late event could compute
        # a timeout the state store rejects)
        close_at = last // 1000 + gap_us // 1000
        wm = state.getCurrentWatermarkMs()
        if wm >= 0 and close_at <= wm:
            close_at = wm + 1
        state.setTimeoutTimestamp(close_at)
        yield pd.DataFrame(
            closed, columns=["container_id", "session_start",
                             "session_end", "n_events"])

    return update

PARTIAL_OUT_SCHEMA = (
    "container_id string, partial_id string, seq long, ts_nanos long, "
    "source string, line string"
)
PARTIAL_STATE_SCHEMA = (
    "seq long, ts_nanos long, max_ts long, source string, "
    "frags array<string>, ords array<int>, got_last boolean"
)

def make_partial_fn(timeout_ms: int):
    """State fn for cross-batch partial-log reassembly.

    One state row per open (container, partial_id): accumulated
    fragments + ordinals. Emits the merged line when the ``last``
    fragment arrives, or flushes whatever arrived once the watermark
    passes the NEWEST fragment's event time + timeout (a fragment
    stream that died mid-line still yields a row — matching the
    reference's best-effort storage of partials). The emitted row's
    ``ts_nanos`` is the OLDEST fragment's time (the line "began"
    then); the two are tracked separately so a partial whose fragments
    trickle in for longer than the timeout keeps getting extended
    instead of being flushed early as two split rows. Event-time
    timeout, not processing-time: a processing-time timeout forces the
    engine into a permanent no-data-batch loop just to poll clocks.
    """

    def update(key, pdfs, state: GroupState):
        container_id, partial_id = key

        def emit(seq, ts, source, frags, ords):
            ordered = [f for _, f in sorted(zip(ords, frags))]
            line = "".join(f.rstrip("\n") for f in ordered) + "\n"
            return pd.DataFrame(
                [(container_id, partial_id, seq, ts, source, line)],
                columns=["container_id", "partial_id", "seq", "ts_nanos",
                         "source", "line"])

        if state.hasTimedOut:
            if state.exists:
                seq, ts, _max_ts, source, frags, ords, _ = state.get
                state.remove()
                yield emit(seq, ts, source, list(frags), list(ords))
            return

        if state.exists:
            seq, ts, max_ts, source, frags, ords, got_last = state.get
            frags, ords = list(frags), list(ords)
        else:
            seq = ts = max_ts = None
            source, frags, ords, got_last = "", [], [], False

        for pdf in pdfs:
            for r in pdf.itertuples():
                t = int(r.ts_nanos)
                seq = int(r.seq) if seq is None else min(seq, int(r.seq))
                ts = t if ts is None else min(ts, t)
                max_ts = t if max_ts is None else max(max_ts, t)
                source = r.source or source
                frags.append(r.line)
                ords.append(int(r.ordinal))
                got_last = got_last or bool(r.last)

        if got_last:
            if state.exists:
                state.remove()
            yield emit(seq, ts, source, frags, ords)
        else:
            state.update((seq, ts, max_ts, source, frags, ords, got_last))
            # flush when the watermark passes newest-fragment time +
            # grace; clamp above the current watermark — a timestamp at
            # or below it is rejected by the state store (a very late
            # fragment could otherwise kill the query)
            flush_at = max_ts // 1_000_000 + timeout_ms
            wm = state.getCurrentWatermarkMs()
            if wm >= 0 and flush_at <= wm:
                flush_at = wm + 1
            state.setTimeoutTimestamp(flush_at)
            yield pd.DataFrame(
                columns=["container_id", "partial_id", "seq", "ts_nanos",
                         "source", "line"])

    return update

EWMA_SCHEMA = "user_id long, event_id long, ts_us long, ewma_c double"
EWMA_STATE_SCHEMA = "s double, last_ts long, last_id long"


def make_ewma_fn():
    """Per-key streaming EWMA (α = 1/2) — the batch recurrence
    (operators/anomaly.py::ewma_smooth) carried ACROSS micro-batches
    in one tiny state row per key: (running s, last event position).

    Within a batch, rows are folded in (ts, event_id) order; between
    batches the state resumes exactly where the last batch ended, so
    for in-order arrival the streaming output is row-for-row identical
    to the batch operator on the concatenated input — pinned in
    test_streaming_ewma.py. (Out-of-order arrivals across batch
    boundaries fold in arrival order, the standard online-EWMA
    trade-off; the batch twin is the replayable ground truth.)
    """

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            s, last_ts, last_id = state.get
        else:
            s, last_ts, last_id = None, -1, -1
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for r in pdf.itertuples(index=False):
                x = float(r.value_c)
                s = x if s is None else (s + x) / 2
                out_rows.append((user_id, int(r.event_id),
                                 int(r.ts_us), s))
                last_ts, last_id = int(r.ts_us), int(r.event_id)
        if s is not None:
            state.update((float(s), last_ts, last_id))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[
                "user_id", "event_id", "ts_us", "ewma_c"])

    return update


def streaming_ewma(stream):
    """Streaming twin of ``ewma_smooth``: input needs columns
    (user_id, event_id, ts_us, value_c) plus an event-time ``ts``
    column for the watermark (state is per-key and permanent by
    design — an EWMA never expires — so no timeout is set; key
    cardinality, not history, bounds the store)."""
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_ewma_fn(),
            outputStructType=EWMA_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_reassemble_partials(stream, flush_timeout_ms: int = 60_000,
                                  watermark: str = "10 minutes"):
    """Reassemble partial fragments across micro-batches.

    Input: a streaming DataFrame of partial rows (``partial = true``)
    with the logs-table columns (incl. the ``ts`` timestamp). Output:
    one merged row per completed partial id (append mode). Whole lines
    should bypass this operator (union the two streams downstream).
    """
    from pyspark.sql import functions as F

    prepared = stream.withWatermark("ts", watermark).select(
        "container_id",
        F.col("partial_meta.id").alias("partial_id"),
        "seq", "ts_nanos", "source", "line", "ts",
        F.coalesce(F.col("partial_meta.ordinal"), F.lit(0)).alias("ordinal"),
        F.coalesce(F.col("partial_meta.last"), F.lit(False)).alias("last"),
    )
    return (
        prepared.groupBy("container_id", "partial_id")
        .applyInPandasWithState(
            make_partial_fn(flush_timeout_ms),
            outputStructType=PARTIAL_OUT_SCHEMA,
            stateStructType=PARTIAL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

def streaming_sessionize(stream, gap_s: int, ts_col: str = "ts",
                         key: str = "container_id",
                         watermark: str = "10 minutes"):
    """Watermarked incremental sessionization over a streaming logs
    DataFrame; emits one row per *closed* session (append mode)."""
    from pyspark.sql import functions as F

    gap_us = gap_s * 1_000_000
    prepared = (
        stream.withWatermark(ts_col, watermark)
        .select(F.col(key).alias("container_id"), F.col(ts_col),
                F.unix_micros(F.col(ts_col)).alias("ts_us"))
    )
    return (
        prepared.groupBy("container_id")
        .applyInPandasWithState(
            make_session_fn(gap_us),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
