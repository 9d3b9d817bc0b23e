"""Relational operators Spark lacks as built-ins: as-of join,
gap-based sessionization, grouped exact quantiles.

All three are expressed as window/aggregate plans (no Python on the row
path, no range-join explosion) so Catalyst keeps them in whole-stage
codegen and the shuffle keys are the natural partition keys (`on`,
`user`, `group`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _reject_reserved(
    op: str, reserved: set[str], *frames: DataFrame
) -> None:
    """Working/output column names must not collide with user data: a
    silent ``withColumn`` overwrite returns the internal value under the
    user's name (or a later ``drop`` deletes the user's column) with no
    error at all. Fail loud instead."""
    for df in frames:
        clash = reserved & set(df.columns)
        if clash:
            raise ValueError(
                f"{op}: input column(s) {sorted(clash)} collide with "
                "internal working/output names — rename them first"
            )


def _is_orderable(dt) -> bool:
    """Spark cannot ORDER BY map-containing types (AnalysisException)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _is_orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_is_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row of the
    same ``on`` key with ``right_ts <= left_ts``.

    Implemented with the union+window trick, NOT a range join: tag both
    sides, union them, and carry the last-seen right payload forward with
    ``last(..., ignorenulls=True)`` over (on, ts). One shuffle on the key,
    window cost O(n log n) per key — no |L|×|R| candidate explosion, so it
    survives 100 TB where an inequality join would not. Right-side ts ties
    resolve to the row that sorts LAST by (right_ts, orderable payload
    columns) — deterministic whenever at least one orderable payload
    column distinguishes the tied rows; map-typed payload columns ride
    along but cannot participate in the tie-break (Spark cannot sort
    maps).

    ``tolerance`` (e.g. ``"INTERVAL 1 HOUR"``): matches older than
    ``left_ts - tolerance`` are nulled out, like pandas merge_asof.
    """
    _reject_reserved(
        "asof_join", {"_ts", "_side", "_payload", "_match", "_tie"},
        left, right,
    )
    right_payload = right_payload or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    # a NULL right_ts would sort before every real row (asc nulls-first)
    # and its payload would be carried as the "match" for left rows that
    # precede any real right row — drop such rows up front
    right = right.where(F.col(right_ts).isNotNull())
    payload = F.struct(
        F.col(right_ts).alias("_ats"),
        *[F.col(c) for c in right_payload],
    )
    # the equal-ts tie-break orders by the payload, but ORDER BY rejects
    # map-containing types — build the tie key from the orderable payload
    # columns only (a map column still rides in the payload itself)
    orderable = [
        c for c in right_payload
        if _is_orderable(right.schema[c].dataType)
    ]
    tie = F.struct(
        F.col(right_ts).alias("_ats"),
        *[F.col(c) for c in orderable],
    )
    r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        payload.alias("_payload"),
        tie.alias("_tie"),
    )
    l = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_side", F.lit(0))
        .withColumn(
            "_payload", F.lit(None).cast(r.schema["_payload"].dataType)
        )
        .withColumn("_tie", F.lit(None).cast(r.schema["_tie"].dataType))
    )

    unioned = l.unionByName(
        r.select(*[F.lit(None).cast(l.schema[c].dataType).alias(c)
                   for c in left.columns if c not in (on,)],
                 on, "_ts", "_side", "_payload", "_tie"),
        allowMissingColumns=False,
    )
    # right rows sort BEFORE left rows at equal ts (_side 1 first via desc)
    # so an exact-ts quote is visible to the same-ts trade
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").desc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = matched.where(F.col("_side") == 0)
    if tolerance is not None:
        out = out.withColumn(
            "_match",
            F.when(
                F.col("_match._ats")
                >= F.col("_ts") - F.expr(tolerance),
                F.col("_match"),
            ),
        )
    cols = [c for c in left.columns]
    return out.select(
        *cols,
        F.col("_match._ats").alias("asof_ts"),
        *[F.col(f"_match.{c}").alias(f"asof_{c}") for c in right_payload],
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "INTERVAL 30 MINUTES",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    user's previous event exceeds ``gap``. Returns one row per session:
    (user, session_id, n_events, session_start, session_end).

    Two windows over the same (user, ts) sort — one shuffle total; the
    session id is the running count of session starts (deterministic,
    dense from 1 per user).

    Boundary semantics vs the streaming twin
    (streaming.validate_stream.stream_sessionize): the gap test here is
    STRICT (``ts > prev + gap`` starts a new session), matching the SQL
    oracle, while Spark's native ``session_window`` closes at
    ``prev + gap`` EXCLUSIVE — an event exactly ``gap`` after the
    previous one is the same session here but a new one there, and
    session_end is max(ts) here vs last_event+gap there. Reconciling a
    backfill against the stream must account for both.
    """
    _reject_reserved(
        "sessionize", {"_start", "session_id", "n_events",
                       "session_start", "session_end"}, df,
    )
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    is_start = (
        prev.isNull() | (F.col(ts_col) > prev + F.expr(gap))
    ).cast("long")
    with_sessions = df.withColumn("_start", is_start).withColumn(
        "session_id",
        F.sum("_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_sessions.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def grouped_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float],
    method: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantiles.

    ``method="exact"``: linear-interpolation ``percentile`` (== DuckDB /
    Postgres ``quantile_cont``) — holds each group's values in memory,
    right for bounded-cardinality groups and for oracle comparisons.

    ``method="approx"``: ``approx_percentile`` (Greenwald–Khanna sketch,
    mergeable, bounded memory ~O(accuracy)) — the 100 TB path: rank error
    ≤ 1/accuracy, map-side combinable, no group materialisation.
    """
    if method not in ("exact", "approx"):
        raise ValueError(f"unknown method: {method!r}")
    qs = ", ".join(repr(float(q)) for q in quantiles)
    # backtick-quote the column (escaping embedded backticks) — a name
    # with spaces/reserved words would fail to parse, and a name holding
    # an expression fragment would silently compute something else
    vq = "`" + value_col.replace("`", "``") + "`"
    if method == "approx":
        agg = F.expr(
            f"approx_percentile({vq}, array({qs}), {int(accuracy)})"
        )
    else:
        agg = F.expr(f"percentile({vq}, array({qs}))")
    out = df.groupBy(group_col).agg(agg.alias("_qs"))
    return out.select(
        group_col,
        *[
            F.round(F.col("_qs")[i], 4)
            .alias(f"q{str(q).replace('.', '_')}")
            for i, q in enumerate(quantiles)
        ],
    )


def _as_num(df, col):
    # timestamp→double keeps fractional seconds (unix_timestamp would
    # truncate to whole seconds and silently widen the window).
    # TIMESTAMP_NTZ must NOT hop through the session timezone: the
    # offset is not constant across a DST transition, so a window
    # spanning spring-forward would silently admit/drop wrong pairs.
    # Wall-clock values get linear micros-since-epoch via
    # timestampdiff, which is timezone-free by construction.
    dt = dict(df.dtypes)[col]
    c = F.col(col)
    if dt == "timestamp_ntz":
        return (
            F.expr(
                "timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)"
            )
            / F.lit(1_000_000.0)
        )
    return c.cast("double")


def _range_frame_bound(v: float) -> str:
    """SQL RANGE-frame bound for a numeric offset. ``CURRENT ROW`` is the
    0 spelling (peer rows — identical to ``0 FOLLOWING`` for a RANGE
    frame); floats go through repr so 300.0 stays a double literal and
    the frame boundary arithmetic (order_value + offset) runs in the
    same double type as range_join's post-filter."""
    if v == 0:
        return "CURRENT ROW"
    return (
        f"{abs(v)!r} PRECEDING" if v < 0 else f"{v!r} FOLLOWING"
    )


def range_count(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    lower: float,
    upper: float,
    coarse_width: float | None = None,
    out_col: str = "n_in_range",
) -> DataFrame:
    """Per left row: COUNT of right rows with ``right_on`` in
    ``[left_on + lower, left_on + upper)`` — the aggregation-only face of
    :func:`range_join`, computed WITHOUT materialising candidate pairs.

    ``range_join(...).groupBy(left_id).count()`` materialises every
    candidate pair before counting; at a fixed time span the per-bucket
    density grows linearly with input size and the pair volume
    quadratically (1M events over 30 days = ~116 rows per 300 s bucket →
    ~232M joined rows just to be counted). This plan is the distributed
    interval-count instead: tag left rows ``_w=0`` / right rows ``_w=1``,
    replicate each right row into every coarse time bucket whose left
    windows can see it (``1 + (upper-lower)/W`` copies), hash-shuffle by
    bucket, and take two RANGE-frame window sums per left row. The
    inclusive ``[lower, upper]`` sum minus the exactly-at-``upper`` sum
    yields the half-open ``[lower, upper)`` the join post-filter
    computes — the frame boundary is ``order_value + offset`` in the
    same double arithmetic, so the comparison is bit-identical. Work is
    O(n log n) per bucket with shuffle volume ``|L| + ~2|R|`` skinny
    rows; no pair blowup at any density — a single pathological burst
    degrades to one O(n log n) sorted bucket, never O(n²) pairs.

    Matches ``range_join`` + count semantics exactly: left rows whose
    ``left_on`` is NULL produce no output row (an inequality on NULL
    never matches), and right rows with NULL ``right_on`` count nowhere.
    Bucket count ~ span/``coarse_width`` scales with the data and AQE
    coalesces the shuffle, so parallelism is data-adaptive.
    """
    if upper <= lower:
        raise ValueError(f"empty range window [{lower}, {upper})")
    w = float(coarse_width) if coarse_width is not None else (upper - lower)
    if w <= 0:
        raise ValueError(f"coarse_width must be positive, got {w}")
    _reject_reserved(
        "range_count", {"_x", "_w", "_cb", out_col}, left
    )
    lnum = _as_num(left, left_on)
    rnum = _as_num(right, right_on)

    l_part = (
        left.withColumn("_x", lnum)
        .where(F.col("_x").isNotNull())
        .withColumn("_w", F.lit(0).cast("long"))
        .withColumn("_cb", F.floor(F.col("_x") / F.lit(w)).cast("long"))
    )
    # a right row at r is visible to left buckets B with
    # B*W <= r - lower  AND  (B+1)*W > r - upper, i.e.
    # B in [floor((r-upper)/W), floor((r-lower)/W)] — exact, one replica
    # per bucket, so in-partition RANGE frames never double-count
    r_part = (
        right.select(rnum.alias("_x"))
        .where(F.col("_x").isNotNull())
        .withColumn("_w", F.lit(1).cast("long"))
        .withColumn(
            "_cb",
            F.explode(
                F.sequence(
                    F.floor((F.col("_x") - F.lit(upper)) / F.lit(w)).cast(
                        "long"
                    ),
                    F.floor((F.col("_x") - F.lit(lower)) / F.lit(w)).cast(
                        "long"
                    ),
                )
            ),
        )
    )
    both = l_part.unionByName(r_part, allowMissingColumns=True)
    over = "PARTITION BY _cb ORDER BY _x RANGE BETWEEN {} AND {}"
    cnt_incl = F.expr(
        "sum(_w) OVER ("
        + over.format(_range_frame_bound(lower), _range_frame_bound(upper))
        + ")"
    )
    cnt_at_up = F.expr(
        "sum(_w) OVER ("
        + over.format(_range_frame_bound(upper), _range_frame_bound(upper))
        + ")"
    )
    counted = both.select(
        *left.columns,
        F.col("_w"),
        (F.coalesce(cnt_incl, F.lit(0)) - F.coalesce(cnt_at_up, F.lit(0)))
        .cast("long")
        .alias(out_col),
    )
    return counted.where(F.col("_w") == 0).drop("_w")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    lower: float,
    upper: float,
    bucket_width: float | None = None,
) -> DataFrame:
    """Interval join: pair each left row with the right rows whose
    ``right_on`` lies in ``[left_on + lower, left_on + upper)``. Columns
    may be numeric or timestamps (timestamps are compared in epoch
    seconds; ``lower``/``upper``/``bucket_width`` are then seconds).

    Spark's native plan for an inequality-only join is a broadcast
    nested loop — O(|L|·|R|), dead at scale. This implements the binned
    range join instead: quantise both sides into buckets of
    ``bucket_width``, explode each left row to the handful of buckets its
    window can touch (``ceil((upper-lower)/w)+1`` copies), hash-join on
    the bucket id, then post-filter the exact inequality. Shuffle volume
    is |L|·span + |R| keyed rows instead of the cross product, and the
    equi-join keeps AQE/skew handling applicable.

    ``bucket_width`` defaults to the window length (span of 2 buckets
    per left row — the right default when matches are sparse per window).
    """
    if upper <= lower:
        raise ValueError(f"empty range window [{lower}, {upper})")
    w = float(bucket_width) if bucket_width is not None else (upper - lower)
    if w <= 0:
        raise ValueError(f"bucket_width must be positive, got {w}")

    lnum = _as_num(left, left_on)
    rnum = _as_num(right, right_on)
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"column collision {sorted(overlap)}: alias before joining"
        )
    _reject_reserved("range_join", {"_bucket", "_lnum", "_rnum"}, left, right)
    lb = F.floor((lnum + F.lit(lower)) / F.lit(w)).cast("long")
    # upper bound is exclusive: a window ending exactly on a bucket edge
    # does not touch that bucket, hence the epsilon-free floor on
    # (upper - tiny) is avoided by joining one bucket wide and relying on
    # the exact post-filter for correctness
    ub = F.floor((lnum + F.lit(upper)) / F.lit(w)).cast("long")
    l_exp = left.withColumn("_lnum", lnum).withColumn(
        "_bucket", F.explode(F.sequence(lb, ub))
    )
    r_tag = right.withColumn("_rnum", rnum).withColumn(
        "_bucket", F.floor(F.col("_rnum") / F.lit(w)).cast("long")
    )
    joined = l_exp.join(r_tag, on="_bucket").where(
        (F.col("_rnum") >= F.col("_lnum") + F.lit(lower))
        & (F.col("_rnum") < F.col("_lnum") + F.lit(upper))
    )
    return joined.drop("_bucket", "_lnum", "_rnum")
