"""Batch event-stream analytics operators.

The reference engine is graph-only (SURVEY.md §2); these are the
engine extensions a training-data/telemetry pipeline runs next to it
over an append-only event table `(event_id, ts, user_id, event_type,
value, props)` — the batch counterparts of `linkgraph.streaming`
(`windowed_event_counts`, `sessionize`): identical semantics, exact
SQL-oracle-able results.

Scale design (100 TB event logs, 1000 executors):

  * `sessionize` / `session_stats` shuffle ONCE on the user key; the
    window/group state per task is bounded by a single user's history.
    That per-user bound is inherent to gap sessionization (salting a
    user across tasks cannot see cross-salt gaps), so the hot-key
    limit is the single hottest user — in practice bot filtering or a
    `max_events_per_user` pre-cap, not a different shuffle plan.
  * `windowed_counts` is a partial-aggregable groupBy on a
    low-cardinality composite key (time bucket × type): map-side
    combine collapses each input split to ~|buckets×types| rows, so
    the shuffle is tiny regardless of input size.
  * `funnel` / `retention_cohorts` reduce events to per-user frames
    first (events ≫ users), then join user-level frames — each
    subsequent join input is ≤ |users| rows and broadcastable.
  * `props_stats` parses JSON with `get_json_object` — JVM-side,
    whole-stage-codegen, no Python in the hot path.

All timestamps are emitted as epoch seconds (BIGINT) so results hash
identically across engines regardless of session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sessionize",
    "session_stats",
    "windowed_counts",
    "windowed_anomalies",
    "funnel",
    "retention_cohorts",
    "props_stats",
]


def _epoch_sec(col: str):
    """Fractional epoch seconds for TIMESTAMP or TIMESTAMP_NTZ columns.

    NTZ won't cast to double directly; routing through TIMESTAMP is
    exact because the engine pins spark.sql.session.timeZone=UTC
    (linkgraph.session), making NTZ wall time == UTC instant — the
    same naive-as-UTC convention DuckDB's epoch() uses, so oracles
    agree to the microsecond.
    """
    return F.col(col).cast("timestamp").cast("double")


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign a per-user session index to every event (gap timeout).

    A new session starts at a user's first event and whenever the gap
    since their previous event exceeds ``gap_minutes``. Deterministic:
    ordering ties on ``ts`` break on ``order_tiebreak``.

    Returns the input plus ``session_idx`` (1-based per user). Same
    session semantics as the streaming operator
    `linkgraph.streaming.sessionize` (applyInPandasWithState), which
    emits only closed sessions; this batch form labels every event.

    One shuffle (window partition on ``user_col``); both window
    functions share the single sort, so Catalyst plans exactly one
    exchange + one sort.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev.isNull()
        | (
            _epoch_sec(ts_col) - prev.cast("timestamp").cast("double")
            > gap_minutes * 60
        ),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_idx",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """One row per (user, session): event count, start/end epoch,
    duration, value sum, distinct event types.

    `sessionize`'s user-key shuffle already co-locates each session's
    rows, so the groupBy is shuffle-free (partial agg within the same
    partitioning).
    """
    labeled = sessionize(events, gap_minutes, ts_col=ts_col, user_col=user_col)
    return labeled.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min(F.unix_timestamp(ts_col)).alias("start_epoch"),
        F.max(F.unix_timestamp(ts_col)).alias("end_epoch"),
        F.round(
            F.max(_epoch_sec(ts_col)) - F.min(_epoch_sec(ts_col)), 6
        ).alias("duration_sec"),
        F.round(F.sum("value"), 6).alias("total_value"),
        F.countDistinct("event_type").alias("n_types"),
    )


def windowed_counts(
    events: DataFrame,
    bucket: str = "hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts + value sums per (bucket, key).

    Batch twin of `linkgraph.streaming.windowed_event_counts` (same
    aggregate; the streaming form adds the watermark). ``bucket`` is
    any `date_trunc` unit.
    """
    return (
        events.groupBy(
            F.date_trunc(bucket, F.col(ts_col)).cast("long").alias("bucket_start"),
            F.col(key_col),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    within_minutes: int | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Greedy sequential funnel: users reached per ordered step.

    Step k's timestamp for a user is the MINIMUM event time of type
    ``steps[k]`` strictly after their step-(k-1) timestamp (greedy
    matching — the standard product-analytics funnel contract; greedy
    first-match maximizes completion for a 2-step funnel and is the
    deterministic convention beyond). With ``within_minutes`` the
    whole sequence must complete within that span of step 1's time.

    Returns (step_index, step, users) — one row per step, counts
    monotone non-increasing.

    Plan: one filtered aggregation per step over the events table
    (predicate pushdown prunes each scan to one event type), then
    user-level joins; every join input after the first aggregation is
    ≤ |users| rows.
    """
    if not steps:
        raise ValueError("funnel requires at least one step")
    ts_sec = _epoch_sec(ts_col)
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_sec).alias("t1"))
    )
    stages = [(1, steps[0], reached)]
    prev = reached.select(user_col, F.col("t1").alias("t_prev"), F.col("t1"))
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(user_col, ts_sec.alias("t_step"))
            .join(prev, user_col)
            .filter(F.col("t_step") > F.col("t_prev"))
        )
        if within_minutes is not None:
            nxt = nxt.filter(
                F.col("t_step") <= F.col("t1") + within_minutes * 60
            )
        nxt = nxt.groupBy(user_col, "t1").agg(F.min("t_step").alias("t_k"))
        stages.append((k, step, nxt))
        prev = nxt.select(user_col, F.col("t_k").alias("t_prev"), "t1")
    out = None
    for idx, step, frame in stages:
        row = frame.agg(F.count("*").alias("users")).select(
            F.lit(idx).alias("step_index"),
            F.lit(step).alias("step"),
            "users",
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Classic retention triangle: users active N days after their
    cohort day (day of first event).

    Returns (cohort_day epoch, day_offset, users). No join: one
    user-keyed aggregation computes cohort day AND the active-day set
    in the same pass (per-task state bounded by one user's distinct
    days — the same per-user bound `sessionize` documents), then a
    tiny (cohort, offset) count. Two shuffles total, both with
    map-side partial aggregation; a billion-user table never builds a
    broadcast or joins user-level frames.
    """
    day = F.date_trunc("day", F.col(ts_col))
    per_user = events.groupBy(user_col).agg(
        F.min(day).alias("cohort_day"),
        F.collect_set(day).alias("active_days"),
    )
    # active_days is a SET per user, so after explode each user hits a
    # given (cohort_day, day_offset) cell exactly once — COUNT(*) is a
    # distinct-user count without the countDistinct expand.
    return (
        per_user.select(
            "cohort_day", F.explode("active_days").alias("active_day")
        )
        .groupBy(
            F.col("cohort_day").cast("long").alias("cohort_day"),
            F.datediff("active_day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count("*").alias("users"))
    )


def props_stats(
    events: DataFrame,
    field: str = "k",
    type_col: str = "event_type",
    props_col: str = "props",
) -> DataFrame:
    """Per-type stats over one numeric field of the JSON props column.

    `get_json_object` runs JVM-side inside whole-stage codegen — the
    semi-structured hot path stays out of Python. Rows whose props
    lack the field (or aren't valid JSON) count in ``n`` but not in
    ``n_with_field``/sums.
    """
    v = F.get_json_object(F.col(props_col), f"$.{field}").cast("double")
    return events.groupBy(type_col).agg(
        F.count("*").alias("n"),
        F.count(v).alias("n_with_field"),
        F.round(F.sum(v), 6).alias("sum_field"),
        F.round(F.avg(v), 6).alias("avg_field"),
    )


def transition_matrix(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """First-order Markov transitions between event types: for each
    (from_type, to_type) the transition count and row-normalized
    probability P(next=to | cur=from), over each user's time-ordered
    event sequence (ties break on ``order_tiebreak``).

    One user-key window shuffle (shared sort with sessionize) + one
    tiny (|types|²-bounded) pair aggregation with map-side combine;
    the probability divides two integer counts — exact cross-engine.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    totals = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(totals), 6).alias("p"),
    )


def top_session_paths(
    events: DataFrame,
    k: int = 20,
    gap_minutes: int = 30,
    max_len: int = 10,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Path mining: the k most frequent session event-type sequences
    (first ``max_len`` events per session, joined with '>'), with
    counts — "view>click>purchase"-style behavioral paths.

    Rides `sessionize`'s single user-key window shuffle; the sequence
    assembly is an array_sort aggregation (no second sort), the path
    census is a partial-aggregated groupBy on the path string, and
    the top-k is a distributed TakeOrdered (count desc, path asc).
    ``max_len`` bounds the path-string domain so the census key space
    stays bounded regardless of session length.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    labeled = sessionize(events, gap_minutes, ts_col=ts_col, user_col=user_col)
    paths = (
        labeled.groupBy(user_col, "session_idx")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col(ts_col).alias("t"),
                                    F.col("event_id").alias("e"),
                                    F.col(type_col).alias("y"),
                                )
                            )
                        ),
                        lambda s: s["y"],
                    ),
                    1,
                    max_len,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(k)
    )


_BUCKET_SEC = {"minute": 60, "hour": 3600, "day": 86400}


def windowed_anomalies(
    events: DataFrame,
    bucket: str = "hour",
    z_thresh: float = 3.0,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Volume-anomaly detection per event type: z-score each tumbling
    window's count against that type's own history (EMPTY windows
    count as 0 — a type that goes quiet is as anomalous as one that
    spikes) and keep windows with |z| >= ``z_thresh``.

    Returns (event_type, bucket_start, n, z) with z rounded to 6 and
    the filter applied to the ROUNDED value (engine-stable boundary).
    Exactness: the zero-filled grid makes every moment an INTEGER
    (n_buckets, Σn, Σn²), sample variance is an exact integer ratio
    (n_b·Σn² − (Σn)²) / (n_b·(n_b−1)), and z is one fixed double
    tree. Types with n_buckets < 2 or zero variance emit nothing.

    Scale shape: one (bucket, type) count shuffle (map-side
    combinable), a |types|-row broadcast grid fan-out bounded by the
    time range (NOT |events|), one |types|-row moment aggregate
    joined back. (Σn)² overflows int64 past ~3e9 events per type —
    cast the moment columns to decimal(38,0) there.
    """
    if bucket not in _BUCKET_SEC:
        raise ValueError(f"bucket must be one of {sorted(_BUCKET_SEC)}, got {bucket!r}")
    step = _BUCKET_SEC[bucket]
    counts = events.groupBy(
        F.date_trunc(bucket, F.col(ts_col)).cast("long").alias("bucket_start"),
        F.col(key_col).alias("event_type"),
    ).agg(F.count("*").alias("n"))
    bounds = counts.agg(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    )
    grid = (
        counts.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(step))
            ).alias("bucket_start"),
        )
    )
    filled = grid.join(counts, ["event_type", "bucket_start"], "left").select(
        "event_type", "bucket_start", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    mom = filled.groupBy("event_type").agg(
        F.count("*").alias("nb"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    varnum = F.col("nb") * F.col("s2") - F.col("s1") * F.col("s1")
    varden = F.col("nb") * (F.col("nb") - 1)
    mean = F.col("s1").cast("double") / F.col("nb").cast("double")
    std = F.sqrt(varnum.cast("double") / varden.cast("double"))
    z = F.round((F.col("n").cast("double") - mean) / std, 6)
    return (
        filled.join(mom, "event_type")
        .filter((F.col("nb") > 1) & (varnum > 0))
        .select("event_type", "bucket_start", "n", z.alias("z"))
        .filter(F.abs(F.col("z")) >= z_thresh)
    )


def windowed_anomalies_sql(
    bucket: str = "hour", z_thresh: float = 3.0, table: str = "events"
) -> str:
    """Oracle for `windowed_anomalies` — identical zero-filled grid,
    integer moments, and fixed z tree."""
    if bucket not in _BUCKET_SEC:
        raise ValueError(f"bucket must be one of {sorted(_BUCKET_SEC)}, got {bucket!r}")
    step = _BUCKET_SEC[bucket]
    return f"""
WITH counts AS (
  SELECT CAST(epoch(date_trunc('{bucket}', ts)) AS BIGINT) AS bucket_start,
         event_type, COUNT(*) AS n
  FROM {table} GROUP BY 1, 2),
bounds AS (SELECT MIN(bucket_start) AS lo, MAX(bucket_start) AS hi FROM counts),
grid AS (SELECT t.event_type,
                UNNEST(generate_series(b.lo, b.hi, {step})) AS bucket_start
         FROM (SELECT DISTINCT event_type FROM counts) t CROSS JOIN bounds b),
filled AS (SELECT g.event_type, g.bucket_start,
                  CAST(COALESCE(c.n, 0) AS BIGINT) AS n
           FROM grid g LEFT JOIN counts c
             ON c.event_type = g.event_type AND c.bucket_start = g.bucket_start),
mom AS (SELECT event_type, COUNT(*) AS nb, SUM(n) AS s1, SUM(n * n) AS s2
        FROM filled GROUP BY event_type)
SELECT f.event_type, f.bucket_start, f.n,
       ROUND((CAST(f.n AS DOUBLE) - CAST(m.s1 AS DOUBLE) / CAST(m.nb AS DOUBLE))
             / sqrt(CAST(m.nb * m.s2 - m.s1 * m.s1 AS DOUBLE)
                    / CAST(m.nb * (m.nb - 1) AS DOUBLE)), 6) AS z
FROM filled f JOIN mom m ON m.event_type = f.event_type
WHERE m.nb > 1 AND m.nb * m.s2 - m.s1 * m.s1 > 0
  AND ABS(ROUND((CAST(f.n AS DOUBLE) - CAST(m.s1 AS DOUBLE) / CAST(m.nb AS DOUBLE))
                / sqrt(CAST(m.nb * m.s2 - m.s1 * m.s1 AS DOUBLE)
                       / CAST(m.nb * (m.nb - 1) AS DOUBLE)), 6)) >= {z_thresh}
"""
