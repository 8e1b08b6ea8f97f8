"""Event-stream analytics over the driver's ``events`` table: tumbling
windows, sessionization, as-of join, pivot, JSON props.

These are the batch analogues of the streaming patterns in SURVEY §2.4/§2.10;
the Structured Streaming variants live in flink_streaming_demo_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_demo_spark.operators.sampling import exact_global_ntile
from flink_streaming_demo_spark.plans.registry import register
from flink_streaming_demo_spark.schemas import load_table as t

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


# --- Tumbling window (W1 degenerate case: slide == length) ------------------

def events_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window per event_type — the degenerate
    slide==length case of W1 (SURVEY §2.10). Same code runs under
    readStream + withWatermark in streaming/pipelines.py."""
    ev = t(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.window("ts", "1 hour"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("event_type"),
        F.col("n_events"),
        F.col("total_value"),
    )


register(
    "events_hourly_counts",
    events_hourly_counts,
    """
    SELECT
        time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
        event_type,
        COUNT(*) AS n_events,
        ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)


# --- Sessionization (gap-based) ---------------------------------------------

def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization per user: lag(ts) -> gap flag -> running
    sum = session id, then per-session aggregates. Scale: one shuffle on
    user_id; windows within a partition are linear scans. Streaming analogue
    is session_window(ts, '30 minutes') (streaming/pipelines.py)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = ev.withColumn(
        "new_session",
        (
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long"), 1).over(w)
            > 1800
        ).cast("int"),
    ).withColumn(
        "session_seq",
        F.sum(F.coalesce(F.col("new_session"), F.lit(1))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_gap.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


register(
    "events_sessionization",
    events_sessionization,
    """
    WITH gaps AS (
        SELECT
            user_id,
            event_id,
            CAST(ts AS TIMESTAMP) AS ts,
            value,
            CAST(epoch(CAST(ts AS TIMESTAMP))
                 - epoch(LAG(CAST(ts AS TIMESTAMP), 1) OVER w) > 1800
                 AS INT) AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    sess AS (
        SELECT
            *,
            CAST(SUM(COALESCE(new_session, 1)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS BIGINT) AS session_seq
        FROM gaps
    )
    SELECT
        user_id,
        session_seq,
        COUNT(*) AS n_events,
        MIN(ts) AS session_start,
        MAX(ts) AS session_end,
        ROUND(SUM(value), 2) AS session_value
    FROM sess
    GROUP BY user_id, session_seq
    """,
)


def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE session-window operator (`F.session_window`) as a batch
    query — the same gap-merge semantics as `events_sessionization` but
    computed by Spark's built-in session aggregation (one hash-partial +
    merge on user_id, no sort-window pass), which is also the exact code
    `streaming_session_counts` runs under readStream (streaming/pipelines.py).

    Boundary contract (probed, pinned by tests/test_event_queries.py): an
    event exactly `gap` after the previous one MERGES into the session
    (window merge condition is start <= end, inclusive), so the oracle's
    new-session predicate is `diff > 1800`, and session_end is
    last event ts + gap — not last event ts as in `events_sessionization`."""
    ev = t(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.session_window(F.col("ts"), "30 minutes"), F.col("user_id")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )
    return agg.select(
        F.col("user_id"),
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        F.col("n_events"),
        F.col("session_value"),
    )


register(
    "events_session_windows",
    events_session_windows,
    """
    WITH gaps AS (
        SELECT
            user_id,
            event_id,
            CAST(ts AS TIMESTAMP) AS ts,
            value,
            CAST(epoch(CAST(ts AS TIMESTAMP))
                 - epoch(LAG(CAST(ts AS TIMESTAMP), 1) OVER w) > 1800
                 AS INT) AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    sess AS (
        SELECT
            *,
            SUM(COALESCE(new_session, 1)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS session_seq
        FROM gaps
    )
    SELECT
        user_id,
        MIN(ts) AS session_start,
        MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        COUNT(*) AS n_events,
        ROUND(SUM(value), 2) AS session_value
    FROM sess
    GROUP BY user_id, session_seq
    """,
)


# --- As-of join --------------------------------------------------------------

def events_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.10 — absent from the reference, core for a
    training-data pipeline): for each purchase event, the user's most recent
    order strictly before a fixed cutoff-mapped event time.

    Scale-safe shape: every cutoff is a month START drawn from a fixed
    84-month grid (1995-2001 x 12), so ``o_orderdate < cutoff`` is exactly
    ``month_bucket(order) < month_bucket(cutoff)``. That admits the
    canonical UNION merge-as-of — zero row expansion (the naive
    inequality join materializes every (purchase, prior-order) pair;
    a grid fan-out costs ~84x the bucket rows; this costs nothing):

    1. orders -> one max(struct) row per (custkey, month): one shuffle at
       order scale, <= 84 rows per user out;
    2. UNION those bucket rows with the distinct (user, cutoff) probe
       keys; ONE window running-max per user ordered by month index
       (probes sort before same-month orders, enforcing the strict '<')
       reads off the as-of value at every probe — O(orders + probes)
       rows through one shuffle, per-user partitions <= 168 rows;
    3. purchases EQUI-join the probe results on (user, cutoff): join
       output is exactly O(purchases) — no pair expansion at fact scale.

    The max tie-breaks on (o_orderdate, o_orderkey) — encoded as one
    bigint so it hash-aggregates (see the inline comment) — mirrored in
    the oracle's row_number order."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    orders = t(spark, sf_dir, "orders")
    # Map 2024 event times onto the 1995-2001 order-date axis deterministically:
    # day-of-month d -> cutoff year 1995 + (d % 7), month from event month.
    ev = ev.withColumn(
        "cutoff",
        F.make_timestamp(
            F.lit(1995) + (F.dayofmonth("ts") % 7),
            F.month("ts"),
            F.lit(1),
            F.lit(0),
            F.lit(0),
            F.lit(0),
        ),
    )
    # (1) per-(user, month) latest order — the only order-scale shuffle.
    # The lexicographic max over (o_orderdate, o_orderkey) rides ONE
    # BIGINT — unix_date * 2^44 + orderkey — instead of max(struct)
    # (r15, guide §2.3/§3): struct grouping values are not
    # hash-aggregatable, so the struct form planned Sort+SortAggregate
    # twice (a full map-side sort of the orders scan); the encoded max
    # is a plain HashAggregate, and the same bigint then flows through
    # the union + running-max window (numeric max, no struct compare)
    # and is decoded only at the final projection. Exact while
    # o_orderkey < 2^44 (~1.8e13 — TPC-H orderkey reaches 6e9 at
    # SF1000; dates are post-1970 so unix_date is nonnegative) AND
    # while o_orderdate is date-granular (r16 ADVICE): the cast to
    # DATE truncates any time-of-day before the max and the decode
    # reconstructs midnight, so two same-day orders tie-break by
    # orderkey, not by intra-day time. True of this schema —
    # o_orderdate is generated as a pure date (sources/tpch.py) and
    # the oracle twin applies the same truncation — but a
    # timestamp-granular source would need epoch-seconds encoding.
    enc_k = 1 << 44
    enc = (
        F.unix_date(F.col("o_orderdate").cast("date")).cast("bigint")
        * F.lit(enc_k)
        + F.col("o_orderkey")
    )
    bidx = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    ord_b = orders.groupBy(
        F.col("o_custkey"), bidx.alias("bidx")
    ).agg(F.max(enc).alias("enc"))
    # (2) union bucket rows with probe keys; one per-user running max.
    # flag=-1 sorts a probe BEFORE orders of its own month, so the window
    # sees exactly the strictly-earlier buckets (o_orderdate < cutoff).
    probes = ev.select("user_id", "cutoff").distinct()
    order_rows = ord_b.select(
        F.col("o_custkey").alias("user_id"),
        F.col("bidx").alias("t"),
        F.lit(0).alias("flag"),
        F.col("enc"),
        F.lit(None).cast("timestamp").alias("cutoff"),
    )
    probe_rows = probes.select(
        "user_id",
        (F.year("cutoff") * 12 + F.month("cutoff")).alias("t"),
        F.lit(-1).alias("flag"),
        F.lit(None).cast("bigint").alias("enc"),
        F.col("cutoff"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "flag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof_dim = (
        order_rows.unionByName(probe_rows)
        .withColumn("latest", F.max("enc").over(w))
        .filter((F.col("flag") == -1) & F.col("latest").isNotNull())
        .select("user_id", "cutoff", "latest")
    )
    # (3) fact-scale EQUI join: one row out per purchase with a prior order
    joined = ev.join(
        asof_dim.withColumnRenamed("user_id", "p_user_id"),
        (ev.user_id == F.col("p_user_id")) & (ev.cutoff == asof_dim.cutoff),
        "inner",
    )
    return joined.select(
        "event_id",
        "user_id",
        ev.cutoff.alias("cutoff"),
        F.expr(
            f"CAST(date_add(DATE '1970-01-01',"
            f" CAST(latest DIV {enc_k} AS INT)) AS TIMESTAMP)"
        ).alias("o_orderdate"),
        (F.col("latest") % F.lit(enc_k)).alias("o_orderkey"),
    )


register(
    "events_asof_latest_order",
    events_asof_latest_order,
    """
    WITH ev AS (
        SELECT
            event_id,
            user_id,
            make_timestamp(
                CAST(1995 + (DAYOFMONTH(CAST(ts AS TIMESTAMP)) % 7) AS BIGINT),
                CAST(MONTH(CAST(ts AS TIMESTAMP)) AS BIGINT),
                1, 0, 0, 0.0
            ) AS cutoff
        FROM events
        WHERE event_type = 'purchase'
    ),
    ranked AS (
        SELECT
            ev.event_id,
            ev.user_id,
            ev.cutoff,
            CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
            o.o_orderkey,
            ROW_NUMBER() OVER (
                PARTITION BY ev.event_id
                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
            ) AS rn
        FROM ev
        JOIN orders o
          ON ev.user_id = o.o_custkey AND o.o_orderdate < ev.cutoff
    )
    SELECT event_id, user_id, cutoff, o_orderdate, o_orderkey
    FROM ranked WHERE rn = 1
    """,
)


# --- Pivot -------------------------------------------------------------------

def events_pivot_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type counts into columns per user (explicit value list so
    the plan is a single pass, no distinct-values pre-query)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


register(
    "events_pivot_type_counts",
    events_pivot_type_counts,
    """
    SELECT
        user_id,
        COUNT(*) FILTER (event_type = 'click') AS click,
        COUNT(*) FILTER (event_type = 'error') AS error,
        COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        COUNT(*) FILTER (event_type = 'signup') AS signup,
        COUNT(*) FILTER (event_type = 'view') AS view
    FROM events
    GROUP BY user_id
    """,
)


# --- Approximate distinct (HLL sketch) ----------------------------------------

def events_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event_type — the scale
    path for distinct counts (exact countDistinct shuffles every distinct
    key; the sketch shuffles a constant-size binary per group) — graded
    as a hash-checkable CONTRACT (r10 verdict #3): the raw estimate is
    engine-internal (HLL++ registers don't replay in DuckDB), so instead
    of emitting it we emit ``within_bound`` = |approx − exact| ≤ 5·rsd·
    exact alongside the exact count. approx_count_distinct is hash-based
    and deterministic for fixed data, the 5σ envelope at rsd=0.02 (10%
    relative) is far beyond HLL++'s observed error, and the oracle's
    TRUE literal pins the contract — the driver now hashes a
    deterministic row instead of recording the weaker rows-only check.
    The estimate-VALUE graders remain the engine-replayable siblings
    events_kmv_distinct_users / events_hll_distinct_users."""
    ev = t(spark, sf_dir, "events")
    rsd = 0.02
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    err = F.abs(
        F.col("approx_users").cast("double")
        - F.col("exact_users").cast("double")
    )
    return agg.select(
        "event_type",
        F.col("exact_users").cast("bigint").alias("exact_users"),
        F.col("n_events").cast("bigint").alias("n_events"),
        (err <= F.lit(5.0 * rsd) * F.col("exact_users").cast("double")).alias(
            "within_bound"
        ),
    )


register(
    "events_approx_distinct_users",
    events_approx_distinct_users,
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS within_bound
    FROM events
    GROUP BY event_type
    """,
)


# --- Array aggregation / array function surface -------------------------------

def events_user_type_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-aggregation surface: distinct event types per user collected
    into a SORTED array (collect_set order is nondeterministic; array_sort
    fixes it), rendered as CSV for engine-portable hashing, plus membership
    and cardinality probes."""
    ev = t(spark, sf_dir, "events")
    types = F.array_sort(F.collect_set("event_type"))
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", types).alias("types_csv"),
        F.size(types).alias("n_types"),
        F.array_contains(types, "purchase").alias("has_purchase"),
        F.count(F.lit(1)).alias("n_events"),
    )


register(
    "events_user_type_arrays",
    events_user_type_arrays,
    """
    SELECT
        user_id,
        array_to_string(list_sort(list(DISTINCT event_type)), ',')
            AS types_csv,
        CAST(len(list(DISTINCT event_type)) AS INT) AS n_types,
        list_contains(list(DISTINCT event_type), 'purchase') AS has_purchase,
        COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)


# --- Statistical aggregates ---------------------------------------------------

def events_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface per event_type: sample stddev/variance,
    exact interpolated percentiles (median, p90), and Pearson correlation.
    Spark's percentile() and DuckDB's quantile_cont() share the same
    linear-interpolation definition; moment aggregates are rounded to absorb
    addition-order drift."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.stddev_samp("value"), 4).alias("value_stddev"),
        F.round(F.var_samp("value"), 4).alias("value_var"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("value_median"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("value_p90"),
        F.round(F.corr("value", F.col("user_id").cast("double")), 4).alias(
            "value_user_corr"
        ),
    )


register(
    "events_value_stats",
    events_value_stats,
    """
    SELECT
        event_type,
        COUNT(*) AS n_events,
        ROUND(STDDEV_SAMP(value), 4) AS value_stddev,
        ROUND(VAR_SAMP(value), 4) AS value_var,
        ROUND(quantile_cont(value, 0.5), 4) AS value_median,
        ROUND(quantile_cont(value, 0.9), 4) AS value_p90,
        ROUND(CORR(value, CAST(user_id AS DOUBLE)), 4) AS value_user_corr
    FROM events
    GROUP BY event_type
    """,
)


# --- JSON props --------------------------------------------------------------

def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props column + aggregation on the extracted
    value (get_json_object stays JVM-side; no Python in the hot path)."""
    ev = t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


register(
    "events_json_props",
    events_json_props,
    """
    SELECT
        event_type,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
            AS sum_k,
        MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)


# --- Interval join (click -> error within horizon) ---------------------------

INTERVAL_HORIZON = "5 minutes"


def error_after_click(
    clicks: DataFrame, errors: DataFrame, how: str = "inner"
) -> DataFrame:
    """Interval join: every (click, error) pair of the same user where
    the error lands in (click_ts, click_ts + 5 minutes]. The join SURVEY
    §2.10 says the reference's two-event design invites but never does —
    expressed Spark-first: an equi-join on user_id plus an event-time
    range predicate, which is also exactly the stream-stream-join form
    Structured Streaming accepts (watermark both sides + time-range
    condition bounds the join state; see streaming/pipelines.py).

    100 TB shape: the user_id equi-key shuffles both sides once
    (co-partitioned sort-merge); the range predicate prunes inside each
    key group, so cost is sum over users of clicks_u x errors_u in the
    horizon — never a cross join. micros_after is integer microseconds
    (exact on both engines; no float time arithmetic)."""
    c = clicks.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    e = errors.select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    return (
        c.join(
            e,
            (F.col("user_id") == F.col("e_user"))
            & (F.col("error_ts") > F.col("click_ts"))
            & (
                F.col("error_ts")
                <= F.col("click_ts") + F.expr(f"INTERVAL {INTERVAL_HORIZON}")
            ),
            how,
        )
        .select(
            "user_id",
            "click_id",
            "error_id",
            (
                F.unix_micros("error_ts") - F.unix_micros("click_ts")
            ).alias("micros_after"),
        )
    )


def events_error_after_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return error_after_click(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "error"),
    )


register(
    "events_error_after_click",
    events_error_after_click,
    """
    SELECT
        c.user_id,
        c.event_id AS click_id,
        e.event_id AS error_id,
        epoch_us(CAST(e.ts AS TIMESTAMP))
            - epoch_us(CAST(c.ts AS TIMESTAMP)) AS micros_after
    FROM events c
    JOIN events e
      ON c.user_id = e.user_id
     AND CAST(e.ts AS TIMESTAMP) > CAST(c.ts AS TIMESTAMP)
     AND CAST(e.ts AS TIMESTAMP)
         <= CAST(c.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
    WHERE c.event_type = 'click' AND e.event_type = 'error'
    """,
)


# --- Robust outlier detection (median/MAD) -----------------------------------

_MAD_K = 1.4826       # normal-consistency constant
_MAD_SIGMA = 3.0


def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type robust outlier stats on the value column: median, MAD
    (median absolute deviation), and how many events sit beyond
    3 * 1.4826 * MAD — the data-quality gate that survives skewed/
    heavy-tailed metrics where mean/stddev z-scores break.

    Exact ``percentile`` per group (5 types here); like
    source_length_quantiles, the documented true-100 TB swap is
    approx_percentile with a tolerance — median/MAD tolerate sketch
    error by design. Three passes over events (median -> MAD ->
    classify), each a partial-aggregated groupBy on a 5-row key with the
    tiny stats frames broadcast back — no wide shuffle of the fact rows.
    """
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(v, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("v") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                (
                    F.col("adev")
                    > F.lit(_MAD_SIGMA * _MAD_K) * F.col("mad")
                ).cast("bigint")
            ).alias("n_outliers"),
        )
        .withColumn(
            "outlier_frac",
            F.round(
                F.col("n_outliers").cast("double")
                / F.col("n_events").cast("double"),
                6,
            ),
        )
    )


register(
    "events_value_outliers",
    events_value_outliers,
    f"""
    WITH med AS (
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, ABS(e.value - m.med) AS adev, m.med
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n_events,
           ROUND(ANY_VALUE(d.med), 6) AS med,
           ROUND(ANY_VALUE(m.mad), 6) AS mad,
           CAST(SUM(CASE WHEN d.adev > {_MAD_SIGMA * _MAD_K} * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(CAST(SUM(CASE WHEN d.adev > {_MAD_SIGMA * _MAD_K} * m.mad
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_frac
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)


# --- Ordered funnel (view -> click -> purchase) ------------------------------

def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel per user: first view, first
    click AFTER that view, first purchase AFTER that click; stage =
    how deep the user got (1..3). The sequential-pattern query (a
    MATCH_RECOGNIZE lite) expressed as three chained min-aggregations —
    each step is a groupBy(user) agg joined back on user, so the whole
    funnel is co-partitioned on user_id: one shuffle establishes the
    partitioning and every later join reuses it. No window-function
    whole-history sort, no explode — linear in events at any depth.

    Users with no view event are not in the funnel (stage 0 = absent).
    """
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).alias("stage"),
        )
    )


register(
    "events_funnel_stages",
    events_funnel_stages,
    """
    WITH v AS (
        SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase'
          AND CAST(e.ts AS TIMESTAMP) > c.t_click
        GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           1 + CASE WHEN c.t_click IS NULL THEN 0 ELSE 1 END
             + CASE WHEN p.t_purchase IS NULL THEN 0 ELSE 1 END AS stage
    FROM v
    LEFT JOIN c USING (user_id)
    LEFT JOIN p USING (user_id)
    """,
)


# --- Weekly cohort retention --------------------------------------------------

_COHORT_EPOCH = "2024-01-01"


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: cohort = the week (since 2024-01-01) of
    a user's first event; for each (cohort_week, week_offset), how many
    of that cohort's users were active offset weeks later. Entirely
    integer week arithmetic on a fixed epoch (identical on any engine).

    Plan: events reduce to distinct (user, week) first — partial agg
    collapses each user's in-week events before the shuffle — then one
    min-per-user (cohort) joined back and a count-distinct per
    (cohort, offset). All keyed on user_id / small grid; output is
    weeks x weeks rows."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        (
            F.datediff(F.to_date("ts"), F.lit(_COHORT_EPOCH).cast("date"))
            / 7
        )
        .cast("int")
        .alias("week"),
    )
    user_weeks = ev.distinct()
    cohort = user_weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    return (
        user_weeks.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


register(
    "events_cohort_retention",
    events_cohort_retention,
    f"""
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('day', DATE '{_COHORT_EPOCH}',
                              CAST(ts AS DATE)) // 7 AS INT) AS week
        FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
    )
    SELECT c.cohort_week,
           uw.week - c.cohort_week AS week_offset,
           COUNT(DISTINCT uw.user_id) AS n_users
    FROM uw JOIN cohort c USING (user_id)
    GROUP BY c.cohort_week, uw.week - c.cohort_week
    """,
)


# --- RFM user segmentation ---------------------------------------------------

_RFM_TILES = 4


def events_user_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation: per user, the
    seconds since their last event (anchored to the corpus max ts so the
    result is replay-stable), their event count, and their total value;
    each scored into quartiles (NTILE(4) semantics) with user_id as the
    deterministic tiebreak, concatenated into the classic 'RFM' segment
    code (recency quartile 1 = most recent).

    100 TB shape: one partial-aggregated groupBy(user_id) over the event
    scan; the corpus-max anchor is a 1-row agg broadcast back (not a
    window), and each quartile score uses exact_global_ntile's two-level
    rank (value-range chunks + broadcast prefix table) — bit-identical
    to the oracle's NTILE with NO single-partition WindowExec anywhere
    in the plan, so distinct-user cardinality never funnels through one
    reducer's sort.

    Lineage discipline: each rank machine references its input THREE
    times (bounds agg, chunked rows, chunk sizes), so chaining three of
    them unchecked multiplies the upstream subtree ~27x (measured in
    the r11 full-surface bench: 2,346 plan nodes, 212 parquet scans).
    A localCheckpoint between stages pins the per-user frame — already
    aggregate-sized, far smaller than the event scan — and keeps every
    score's plan linear. Values are materialized doubles, bit-identical.
    Rule of thumb now recorded in BENCH_NOTES: two chained rank
    machines are fine (sample_curriculum_order, 36 scans), three or
    more need the checkpoint.
    """
    ev = t(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.max(F.col("ts").cast("long")).alias("last_ts"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.round(F.sum("value"), 2).alias("monetary"),
    )
    anchor = per.agg(F.max("last_ts").alias("_max_ts"))
    scored = per.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        (F.col("_max_ts") - F.col("last_ts")).alias("recency_secs"),
        "frequency",
        "monetary",
    ).localCheckpoint(eager=False)
    scored = exact_global_ntile(
        scored, _RFM_TILES, "recency_secs", "user_id", out_col="r_score"
    ).localCheckpoint(eager=False)
    scored = exact_global_ntile(
        scored, _RFM_TILES, "frequency", "user_id", desc=True,
        out_col="f_score",
    ).localCheckpoint(eager=False)
    scored = exact_global_ntile(
        scored, _RFM_TILES, "monetary", "user_id", desc=True,
        out_col="m_score",
    )
    return scored.select(
        "user_id",
        "recency_secs",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws(
            "",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    )


register(
    "events_user_rfm",
    events_user_rfm,
    f"""
    WITH per AS (
        SELECT
            user_id,
            CAST(MAX(FLOOR(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS last_ts,
            CAST(COUNT(*) AS BIGINT) AS frequency,
            ROUND(SUM(value), 2) AS monetary
        FROM events GROUP BY user_id
    ),
    scored AS (
        SELECT
            user_id,
            MAX(last_ts) OVER () - last_ts AS recency_secs,
            frequency,
            monetary
        FROM per
    ),
    tiled AS (
        SELECT
            user_id, recency_secs, frequency, monetary,
            CAST(NTILE({_RFM_TILES}) OVER (
                ORDER BY recency_secs, user_id) AS INT) AS r_score,
            CAST(NTILE({_RFM_TILES}) OVER (
                ORDER BY frequency DESC, user_id) AS INT) AS f_score,
            CAST(NTILE({_RFM_TILES}) OVER (
                ORDER BY monetary DESC, user_id) AS INT) AS m_score
        FROM scored
    )
    SELECT *,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
               || CAST(m_score AS VARCHAR) AS segment
    FROM tiled
    """,
)


# --- Winsorized value stats --------------------------------------------------

_WINSOR_LO = 0.05
_WINSOR_HI = 0.95


def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type value statistics: clip each event's value to
    the type's [P5, P95] band before averaging, so a handful of extreme
    values can't swing the mean the dashboards alert on (the robust
    companion to events_value_stats' raw mean and events_value_outliers'
    MAD flags). Means are computed as explicit sum/count on both engines.

    100 TB shape: the percentile pass produces one tiny row per
    event_type; it is broadcast back onto the scan, so the clip +
    re-aggregation is map-side work on the fact table (two scans, no
    fact-side shuffle beyond the final per-type partial agg). At true
    scale the exact percentile swaps to approx_percentile exactly as
    documented in source_length_quantiles."""
    ev = t(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(_WINSOR_LO)).alias("p_lo"),
        F.percentile(F.col("value"), F.lit(_WINSOR_HI)).alias("p_hi"),
    )
    clipped = ev.join(F.broadcast(bounds), "event_type").withColumn(
        "v_clip",
        F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi")),
    )
    n = F.count(F.lit(1))
    return clipped.groupBy("event_type").agg(
        n.cast("bigint").alias("n_events"),
        F.round(F.min("p_lo"), 6).alias("p05"),
        F.round(F.min("p_hi"), 6).alias("p95"),
        F.round(F.sum("value") / n, 6).alias("raw_mean"),
        F.round(F.sum("v_clip") / n, 6).alias("winsorized_mean"),
        (F.sum((F.col("value") != F.col("v_clip")).cast("int")))
        .cast("bigint")
        .alias("n_clipped"),
    )


register(
    "events_winsorized_stats",
    events_winsorized_stats,
    f"""
    WITH bounds AS (
        SELECT event_type,
               quantile_cont(value, {_WINSOR_LO}) AS p_lo,
               quantile_cont(value, {_WINSOR_HI}) AS p_hi
        FROM events GROUP BY event_type
    ),
    clipped AS (
        SELECT e.event_type, e.value,
               LEAST(GREATEST(e.value, b.p_lo), b.p_hi) AS v_clip,
               b.p_lo, b.p_hi
        FROM events e JOIN bounds b USING (event_type)
    )
    SELECT
        event_type,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        ROUND(MIN(p_lo), 6) AS p05,
        ROUND(MIN(p_hi), 6) AS p95,
        ROUND(SUM(value) / COUNT(*), 6) AS raw_mean,
        ROUND(SUM(v_clip) / COUNT(*), 6) AS winsorized_mean,
        CAST(SUM(CASE WHEN value <> v_clip THEN 1 ELSE 0 END) AS BIGINT)
            AS n_clipped
    FROM clipped
    GROUP BY event_type
    """,
)


# --- SCD2 history build (change data capture -> validity intervals) ----------

def events_scd2_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from the event stream:
    treat each user's event_type as a mutable attribute, keep only the
    CHANGE rows (value differs from the previous event), and assign each
    change a validity interval [valid_from, valid_to) closed by the next
    change, with version numbers and an is_current flag — the standard
    CDC-to-warehouse-dimension transform.

    100 TB shape: one shuffle on user_id; both the change filter
    (lag != current) and the interval close (lead) are single-pass
    window scans within the partition — no self-join, no second shuffle
    (the two windows share partitioning and ordering, so Catalyst plans
    one sort)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn(
        "prev_type", F.lag("event_type").over(w)
    ).filter(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.row_number().over(w2).alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


register(
    "events_scd2_type_history",
    events_scd2_type_history,
    """
    WITH ordered AS (
        SELECT user_id, event_id, event_type,
               CAST(ts AS TIMESTAMP) AS ts,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    changes AS (
        SELECT * FROM ordered
        WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT
        user_id,
        event_type,
        CAST(ROW_NUMBER() OVER w2 AS INT) AS version,
        ts AS valid_from,
        LEAD(ts) OVER w2 AS valid_to,
        (LEAD(ts) OVER w2 IS NULL) AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)


# --- Shuffle-key skew diagnostic ---------------------------------------------

def events_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostic for the user_id shuffle key: per-key counts
    reduced to the distribution stats that decide a salting/AQE strategy
    (hottest-key share, max/mean skew factor, exact P99 of per-key
    counts). One row out — the report a pipeline checks before picking
    join strategy at a new data scale.

    100 TB shape: one partial-aggregated groupBy(user_id) (the same
    shuffle the diagnosed join would do), then a single scalar agg over
    the per-key table. At true scale the exact percentile swaps to
    approx_percentile per the documented pattern."""
    ev = t(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    n_total = F.sum("cnt").cast("double")
    mean_cnt = n_total / F.count(F.lit(1)).cast("double")
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(mean_cnt, 6).alias("mean_cnt"),
        F.round(
            F.percentile(F.col("cnt").cast("double"), F.lit(0.99)), 6
        ).alias("p99_cnt"),
        F.round(F.max("cnt").cast("double") / (n_total / F.count(F.lit(1)).cast("double")), 6).alias(
            "skew_factor"
        ),
        F.round(F.max("cnt").cast("double") / n_total, 6).alias(
            "hottest_share"
        ),
    )


register(
    "events_key_skew_report",
    events_key_skew_report,
    """
    WITH per AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    )
    SELECT
        CAST(COUNT(*) AS BIGINT) AS n_keys,
        CAST(SUM(cnt) AS BIGINT) AS n_rows,
        MAX(cnt) AS max_cnt,
        ROUND(CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
            AS mean_cnt,
        ROUND(quantile_cont(CAST(cnt AS DOUBLE), 0.99), 6) AS p99_cnt,
        ROUND(CAST(MAX(cnt) AS DOUBLE)
              / (CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 6)
            AS skew_factor,
        ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6)
            AS hottest_share
    FROM per
    """,
)


# --- Daily series with range-framed moving average ---------------------------

def events_daily_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts with a 7-day RANGE-framed moving average and a
    previous-present-day delta. The RANGE frame (value-based, anchored
    on a day number) is the correct windowing for calendar series with
    gaps: a missing day still shrinks the average's denominator, which a
    ROWS frame would silently get wrong. This is the engine's only
    range-frame exercise, so it also pins that Catalyst feature.

    100 TB shape: the heavy shuffle collapses the fact table to one row
    per day (partial-aggregated); the window then runs over the tiny
    daily series. Single-partition window over |days| rows is
    intentional — the series IS the small table."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    day_num = F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
    w7 = (
        Window.orderBy(day_num.cast("long"))
        .rangeBetween(-6, Window.currentRow)
    )
    wlag = Window.orderBy("day")
    n = F.col("n_events").cast("double")
    return daily.select(
        F.col("day").cast("timestamp").alias("day"),
        "n_events",
        F.round(F.sum(n).over(w7) / F.count(F.lit(1)).over(w7), 6).alias(
            "ma7"
        ),
        # double, not bigint: the first row is NULL, and a deterministic
        # dtype across engines (DuckDB/pandas promote nullable ints to
        # float64) keeps the driver's dtype-sensitive value hash stable.
        (F.col("n_events") - F.lag("n_events").over(wlag))
        .cast("double")
        .alias("delta_prev_day"),
    )


register(
    "events_daily_moving_avg",
    events_daily_moving_avg,
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    numbered AS (
        SELECT *, date_diff('day', DATE '2024-01-01', day) AS day_num
        FROM daily
    )
    SELECT
        CAST(day AS TIMESTAMP) AS day,
        n_events,
        ROUND(
            SUM(CAST(n_events AS DOUBLE)) OVER w7
                / COUNT(*) OVER w7, 6) AS ma7,
        CAST(n_events - LAG(n_events) OVER (ORDER BY day)
             AS DOUBLE) AS delta_prev_day
    FROM numbered
    WINDOW w7 AS (ORDER BY day_num
                  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)


# --- Temporal (point-in-time) join against the SCD2 dimension ----------------

def events_temporal_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each event joined to the SCD2 version
    valid at its timestamp (valid_from <= ts < valid_to, open interval =
    current version). Returns per (user, version) event counts plus a
    self-consistency flag: because the dimension is derived from this
    same stream, every event's own type must equal its covering
    version's type — ``n_mismatched`` is 0 by construction, so the
    column pins temporal-join correctness inside the hash check itself.

    100 TB shape: equi-join keyed on user_id with the interval predicate
    as a join condition — candidates per event = that user's version
    count (small by construction), never a time-cross; one user_id
    shuffle shared with the SCD2 build."""
    ev = t(spark, sf_dir, "events")
    dim = events_scd2_type_history(spark, sf_dir).select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("dim_type"),
        "version",
        "valid_from",
        "valid_to",
    )
    joined = ev.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (
            F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))
        ),
    )
    return joined.groupBy("user_id", "version", "dim_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(
            (F.col("event_type") != F.col("dim_type")).cast("int")
        ).cast("bigint").alias("n_mismatched"),
    )


register(
    "events_temporal_scd2_join",
    events_temporal_scd2_join,
    """
    WITH ordered AS (
        SELECT user_id, event_id, event_type,
               CAST(ts AS TIMESTAMP) AS ts,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    changes AS (
        SELECT * FROM ordered
        WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    dim AS (
        SELECT
            user_id AS d_user,
            event_type AS dim_type,
            CAST(ROW_NUMBER() OVER w2 AS INT) AS version,
            ts AS valid_from,
            LEAD(ts) OVER w2 AS valid_to
        FROM changes
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT
        e.user_id,
        d.version,
        d.dim_type,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        MIN(CAST(e.ts AS TIMESTAMP)) AS first_ts,
        MAX(CAST(e.ts AS TIMESTAMP)) AS last_ts,
        CAST(SUM(CASE WHEN e.event_type <> d.dim_type THEN 1 ELSE 0 END)
             AS BIGINT) AS n_mismatched
    FROM events e
    JOIN dim d
      ON e.user_id = d.d_user
     AND CAST(e.ts AS TIMESTAMP) >= d.valid_from
     AND (d.valid_to IS NULL OR CAST(e.ts AS TIMESTAMP) < d.valid_to)
    GROUP BY e.user_id, d.version, d.dim_type
    """,
)


# --- Daily anomaly flags (trailing-window z-score) ----------------------------

_ANOM_Z = 2.0


def events_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection on the daily series: each day scored
    against the TRAILING 7-day window ending the previous day (range
    frame -7..-1, so the day never explains itself and calendar gaps
    shrink the baseline correctly); z = (n - mean) / std with an
    explicit-formula std, flagged at |z| >= 2. Days with fewer than 3
    baseline days emit a null z and never flag; a degenerate
    zero-variance baseline also emits a null z but DOES flag any
    deviation from it (a constant baseline makes any departure
    infinitely anomalous — the planted-spike test pins this).

    100 TB shape: identical to events_daily_moving_avg — the fact scan
    collapses to one row per day before any window runs."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    day_num = F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
    wprev = (
        Window.orderBy(day_num.cast("long")).rangeBetween(-7, -1)
    )
    n = F.col("n_events").cast("double")
    base_n = F.count(F.lit(1)).over(wprev).cast("double")
    base_mean = F.sum(n).over(wprev) / base_n
    base_var = (
        F.sum(n * n).over(wprev) / base_n - base_mean * base_mean
    )
    z_raw = F.when(
        (base_n >= 3) & (base_var > 0),
        (n - base_mean) / F.sqrt(base_var),
    )
    return daily.select(
        F.col("day").cast("timestamp").alias("day"),
        "n_events",
        F.round(base_mean, 6).alias("baseline_mean"),
        F.round(z_raw, 6).alias("z_score"),
        (
            F.coalesce(F.abs(z_raw) >= _ANOM_Z, F.lit(False))
            | ((base_n >= 3) & (base_var <= 0) & (n != base_mean))
        ).alias("is_anomaly"),
    )


register(
    "events_daily_anomaly",
    events_daily_anomaly,
    f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    numbered AS (
        SELECT *, date_diff('day', DATE '2024-01-01', day) AS day_num
        FROM daily
    ),
    scored AS (
        SELECT
            day,
            n_events,
            COUNT(*) OVER wprev AS base_n,
            SUM(CAST(n_events AS DOUBLE)) OVER wprev
                / COUNT(*) OVER wprev AS base_mean,
            SUM(CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE))
                OVER wprev / COUNT(*) OVER wprev
                - (SUM(CAST(n_events AS DOUBLE)) OVER wprev
                   / COUNT(*) OVER wprev)
                  * (SUM(CAST(n_events AS DOUBLE)) OVER wprev
                     / COUNT(*) OVER wprev) AS base_var
        FROM numbered
        WINDOW wprev AS (ORDER BY day_num
                         RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ),
    z AS (
        SELECT day, n_events, base_mean, base_n, base_var,
               CASE WHEN base_n >= 3 AND base_var > 0
                    THEN (CAST(n_events AS DOUBLE) - base_mean)
                         / SQRT(base_var)
               END AS z_raw
        FROM scored
    )
    SELECT
        CAST(day AS TIMESTAMP) AS day,
        n_events,
        ROUND(base_mean, 6) AS baseline_mean,
        ROUND(z_raw, 6) AS z_score,
        COALESCE(ABS(z_raw) >= {_ANOM_Z}, FALSE)
            OR (base_n >= 3 AND base_var <= 0
                AND CAST(n_events AS DOUBLE) <> base_mean) AS is_anomaly
    FROM z
    """,
)


# --- Burst suppression (first-in-burst keep) ---------------------------------

BURST_GAP_SECS = 300


def events_first_in_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-event suppression: per (user, event_type), keep only
    events whose predecessor of the same key is more than 300 s older
    (or absent) — the gap-based throttle an ETL ingest applies to
    machine-generated repeat fire. One lag window per key; the kept set
    is deterministic because (user, type, ts) ordering ties break on
    event_id.

    100 TB shape: a single shuffle on (user_id, event_type) — the same
    key the sessionization already uses — and a lag; no self-join."""
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    prev = F.lag("ts").over(w)
    return (
        ev.withColumn("prev_ts", prev)
        .filter(
            F.col("prev_ts").isNull()
            | (
                F.unix_micros("ts") - F.unix_micros("prev_ts")
                > BURST_GAP_SECS * 1_000_000
            )
        )
        .select("event_id", "user_id", "event_type", "ts")
    )


register(
    "events_first_in_burst",
    events_first_in_burst,
    f"""
    SELECT event_id, user_id, event_type, ts
    FROM (
        SELECT event_id, user_id, event_type, ts,
               lag(ts) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id
               ) AS prev_ts
        FROM events
    )
    WHERE prev_ts IS NULL
       OR date_diff('microsecond', prev_ts, ts)
          > {BURST_GAP_SECS} * 1000000
    """,
)


# --- True stateful throttle (vs the gap-filter approximation) ----------------

THROTTLE_QUERY_GAP = 86_400  # daily-digest throttle: drops ~31% at sf0.01


def events_throttle_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept events under the TRUE per-(user, type) throttle — each kept
    event restarts the clock (a sequential recurrence the first-in-burst
    gap filter only approximates). Registered with a 1-day gap so the
    recurrence chain is deep at the checked scale (3,070 of 10,000
    events dropped at sf0.01; a 300 s gap drops only 19 on this sparse
    stream). Arrow-batched partition fold (mapInPandas over key-sorted
    partitions — r11, 27x over the per-group form), hash-checked against
    a recursive-CTE oracle computing the identical chain. See
    operators/throttle."""
    from flink_streaming_demo_spark.operators import throttle as TH

    return TH.throttle_kept_events(
        t(spark, sf_dir, "events"), gap_secs=THROTTLE_QUERY_GAP
    )


def _throttle_oracle() -> str:
    from flink_streaming_demo_spark.operators import throttle as TH

    return f"""
    WITH RECURSIVE {TH.sql_throttle_kept(THROTTLE_QUERY_GAP)}
    SELECT event_id, user_id, event_type, ts FROM kept
    """


register("events_throttle_kept", events_throttle_kept, _throttle_oracle())


# --- Event-type transition matrix --------------------------------------------

def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition counts: for each user, pair
    every event with its successor (ts, event_id order) and count
    (from_type, to_type) globally — the Markov matrix behind
    session-quality and bot-detection heuristics. One lag window per
    user, one partial-aggregated 25-key count."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )


register(
    "events_type_transitions",
    events_type_transitions,
    """
    SELECT from_type, to_type, COUNT(*) AS n_transitions
    FROM (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    )
    WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)


# --- KMV distinct sketch (the hash-checkable approximate distinct) -----------

def events_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) approximate distinct users per event_type —
    an ORACLE-CHECKED sibling of events_approx_distinct_users: the
    BUILT-IN approx_count_distinct's HLL++ registers are engine-internal
    (that query is graded as a bound CONTRACT, not by value), but KMV is pure order statistics over
    md5 fractions, so DuckDB replays the estimate bit-for-bit and the
    driver hash-checks an approximate-distinct operator end to end.
    (events_hll_distinct_users is the register-sketch counterpart: a
    hand-rolled md5-based HyperLogLog whose trajectory also replays.) Merge/rollup form + the sketch(A) ⊕ sketch(B)
    == sketch(A ∪ B) property live in operators/scale.py; bounded-error
    vs exact is pinned in tests/test_scale_utils.py."""
    from flink_streaming_demo_spark.operators.scale import (
        kmv_estimate,
        kmv_partial,
    )

    ev = t(spark, sf_dir, "events")
    return kmv_estimate(kmv_partial(ev, ["event_type"], "user_id"))


def _kmv_oracle() -> str:
    from flink_streaming_demo_spark.operators.scale import sql_kmv_distinct

    return sql_kmv_distinct("event_type", "user_id", "events")


register(
    "events_kmv_distinct_users", events_kmv_distinct_users, _kmv_oracle()
)


def events_kmv_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV rollup: sketch each (event_type, day) partition separately,
    then ⊕-merge the per-day partials up to event_type and estimate —
    the incremental-view shape a 100 TB pipeline actually runs (daily
    partials roll up; history is never rescanned). By merge
    associativity the result EQUALS the direct per-type sketch, so the
    oracle is the same order-statistics replay as
    events_kmv_distinct_users — a hash green here proves the Spark-side
    MERGE arithmetic (flatten, distinct, re-take k smallest), not just
    the single-shot sketch."""
    from flink_streaming_demo_spark.operators.scale import (
        kmv_estimate,
        kmv_partial,
        kmv_rollup,
    )

    ev = t(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = kmv_partial(ev, ["event_type", "day"], "user_id")
    rolled = kmv_rollup(
        daily.select("event_type", "kmv"), ["event_type"]
    )
    return kmv_estimate(rolled)


register(
    "events_kmv_rollup_users",
    events_kmv_rollup_users,
    _kmv_oracle(),
)


def events_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set algebra across event types: estimated |A ∪ B|, |A ∩ B|
    and Jaccard for every unordered pair of event_type user-sets,
    computed FROM THE PER-TYPE SKETCHES ALONE (Beyer et al., SIGMOD
    2007) — the audience-overlap question ("how many users both click
    and purchase?") answered without rescanning the base table, which
    at 100 TB is the difference between reading 10 sketch rows and
    re-shuffling every (type, user) pair. Estimator details and the
    exactness cases live in operators/scale.py:kmv_set_ops; the oracle
    replays the identical order statistics + BIGINT arithmetic."""
    from flink_streaming_demo_spark.operators.scale import (
        kmv_partial,
        kmv_set_ops,
    )

    ev = t(spark, sf_dir, "events")
    return kmv_set_ops(
        kmv_partial(ev, ["event_type"], "user_id"), "event_type"
    )


def _kmv_set_ops_oracle() -> str:
    from flink_streaming_demo_spark.operators.scale import sql_kmv_set_ops

    return sql_kmv_set_ops("event_type", "user_id", "events")


register(
    "events_kmv_set_ops", events_kmv_set_ops, _kmv_set_ops_oracle()
)


def events_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct users per event_type — the
    REGISTER-sketch counterpart of events_kmv_distinct_users: bucket
    index and leading-zero run both derive from the md5 hex string via
    string/arithmetic expressions DuckDB evaluates identically, and the
    harmonic sum is exact-integer (DECIMAL/HUGEINT), so the estimate
    hash-checks end to end where the built-in HLL++
    (events_approx_distinct_users) is only bound-contract-checkable. State per group
    is <= 256 (bucket, max-rho) pairs built by one partial-agg-friendly
    MAX — the mergeable shape per-day partials roll up through
    (events_hll_rolling_users). Bounded error vs exact and the
    sketch(A) ⊕ sketch(B) == sketch(A ∪ B) merge law are pinned in
    tests/test_scale_utils.py."""
    from flink_streaming_demo_spark.operators.scale import (
        hll_estimate,
        hll_partial,
    )

    ev = t(spark, sf_dir, "events")
    return hll_estimate(
        hll_partial(ev, ["event_type"], "user_id"), ["event_type"]
    )


def _hll_oracle() -> str:
    from flink_streaming_demo_spark.operators.scale import sql_hll_distinct

    return sql_hll_distinct("event_type", "user_id", "events")


register(
    "events_hll_distinct_users", events_hll_distinct_users, _hll_oracle()
)


def events_hll_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETIRED registry row (r15, rotation slack — r14 verdict #2).

    HLL rollup: build per-(event_type, day) register partials, merge
    them up to event_type by per-bucket MAX, then estimate — the
    incremental-view shape (daily partials roll up; history is never
    rescanned). Register merge is associative/commutative/idempotent,
    so the result EQUALS the direct per-type sketch and the oracle was
    the same register replay as events_hll_distinct_users (which stays
    registered and driver-checked). The rollup-specific Spark content —
    hll_partial -> hll_rollup -> hll_estimate over day partials — is
    exactly what the driver-checked rolling sibling
    (events_hll_rolling_users) replays per window-end; the retired
    row's identity (rolled-up day partials == direct sketch) is pinned
    by tests/test_retired_rows.py via exceptAll against
    events_hll_distinct_users, and the merge law itself by
    tests/test_scale_utils.py."""
    from flink_streaming_demo_spark.operators.scale import (
        hll_estimate,
        hll_partial,
        hll_rollup,
    )

    ev = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = hll_partial(ev, ["event_type", "day"], "user_id")
    rolled = hll_rollup(
        daily.select("event_type", "bucket", "rho"), ["event_type"]
    )
    return hll_estimate(rolled, ["event_type"])


def events_hll_lc_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-cardinality HLL fixture that PROVABLY exercises the
    linear-counting branch — the ``ln()``-based small-range estimator
    (E' = m*ln(m/V)), the one libm call in the deterministic sketch
    (operators/scale.py hll_estimate_detail). Two planted tiers over the
    events table, sketched in one pass:

      * tier 'lc':       key = user_id # (event_id % 2) — ≈2 keys/user,
        ~300 distinct per event_type at sf0.01, firmly below the
        2.5·m = 640 cut with many zero registers;
      * tier 'near_cut': key = user_id # (event_id % 4) — ~600 distinct,
        pressing against the cut from below, so the branch predicate
        itself (raw-estimate <= 640 AND V > 0) is evaluated where it
        actually matters.

    The result carries ``lc_branch`` as a hash-checked column, so a
    driver green doesn't just say both engines agreed on a number — it
    pins WHICH branch produced every row (tests/test_scale_utils.py
    additionally asserts tier 'lc' rows all took the LC branch). The
    planted key is NULL-propagating concat on both engines (Spark
    F.concat ≡ DuckDB ||), and event_id is non-negative so pmod ≡ %."""
    from flink_streaming_demo_spark.operators.scale import (
        hll_estimate_detail,
        hll_partial,
    )

    ev = t(spark, sf_dir, "events")

    def keyed(mod: int, tier: str) -> DataFrame:
        key = F.concat(
            F.col("user_id").cast("string"),
            F.lit("#"),
            F.pmod(F.col("event_id"), F.lit(mod)).cast("string"),
        )
        return ev.select(
            F.lit(tier).alias("tier"),
            F.col("event_type"),
            key.alias("lc_key"),
        )

    stacked = keyed(2, "lc").unionByName(keyed(4, "near_cut"))
    regs = hll_partial(stacked, ["tier", "event_type"], "lc_key")
    return hll_estimate_detail(regs, ["tier", "event_type"])


def _hll_lc_oracle() -> str:
    from flink_streaming_demo_spark.operators.scale import (
        sql_hll_estimate_from_registers,
        sql_hll_registers,
    )

    def keyed(mod: int, tier: str) -> str:
        return f"""
            SELECT '{tier}' AS tier, event_type,
                   CAST(user_id AS VARCHAR) || '#'
                       || CAST(event_id % {mod} AS VARCHAR) AS lc_key
            FROM events
        """

    registers = sql_hll_registers(
        "tier, event_type", "lc_key", "keyed"
    )
    return f"""
    WITH keyed AS (
        {keyed(2, "lc")}
        UNION ALL
        {keyed(4, "near_cut")}
    ), hll_regs AS (
        {registers}
    )
    {sql_hll_estimate_from_registers("tier, event_type", "hll_regs", detail=True)}
    """


register("events_hll_lc_users", events_hll_lc_users, _hll_lc_oracle())


# --- Bloom / CMS sketches (set membership + frequency, mergeable) ------------

def _bloom_candidates(ev: DataFrame) -> DataFrame:
    """Deterministic probe set for the Bloom fixtures: every 7th user id.
    Some of these users exist in any given event_type's audience and some
    don't, so probes exercise both the all-bits-set and missing-bit
    paths."""
    return (
        ev.select(F.col("user_id"))
        .filter(F.col("user_id") % 7 == 0)
        .distinct()
    )


def events_bloom_flagged_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom set-membership audit: per event_type, sketch the type's user
    audience into a Bloom filter (operators/scale.bloom_partial — the
    broadcastable replacement for a shuffle semi-join at 100 TB), probe a
    fixed candidate-user set against it, and report the probable-member
    count next to the EXACT member count from a distinct join. Bloom has
    no false negatives, so n_maybe >= n_exact row by row — both counts in
    one hash-checked result makes the one-sided-error contract itself
    part of the driver check. The sketch is <= 66 BIGINT words per group
    (4096 bits); probes are a broadcast join, map-side."""
    from flink_streaming_demo_spark.operators.scale import (
        bloom_maybe_contains,
        bloom_partial,
    )

    ev = t(spark, sf_dir, "events")
    sketch = bloom_partial(ev, ["event_type"], "user_id")
    cands = _bloom_candidates(ev)
    types = ev.select("event_type").distinct()
    probes = types.crossJoin(cands)
    probed = bloom_maybe_contains(
        sketch, probes, ["event_type"], "user_id"
    )
    exact = (
        ev.select("event_type", "user_id")
        .distinct()
        .join(cands, "user_id", "left_semi")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    maybe = probed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum(F.col("maybe_member").cast("bigint")).alias("n_maybe"),
    )
    return maybe.join(exact, "event_type", "left").select(
        "event_type",
        "n_candidates",
        "n_maybe",
        F.coalesce("n_exact", F.lit(0).cast("bigint")).alias("n_exact"),
    )


def _bloom_oracle() -> str:
    from flink_streaming_demo_spark.operators.scale import (
        sql_bloom_bits,
        sql_bloom_maybe_contains,
    )

    sketch = sql_bloom_bits("event_type", "user_id", "events")
    probe = sql_bloom_maybe_contains(
        "event_type", "user_id", "probes", "sketch"
    )
    return f"""
    WITH cands AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 7 = 0
    ), probes AS (
        SELECT event_type, user_id
        FROM (SELECT DISTINCT event_type FROM events), cands
    ), sketch AS (
        {sketch}
    ), probed AS (
        {probe}
    ), maybe AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(SUM(CASE WHEN maybe_member THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_maybe
        FROM probed GROUP BY event_type
    ), exact AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM (SELECT DISTINCT event_type, user_id FROM events)
        WHERE user_id IN (SELECT user_id FROM cands)
        GROUP BY event_type
    )
    SELECT m.event_type, m.n_candidates, m.n_maybe,
           COALESCE(e.n_exact, CAST(0 AS BIGINT)) AS n_exact
    FROM maybe m LEFT JOIN exact e USING (event_type)
    """


register(
    "events_bloom_flagged_users",
    events_bloom_flagged_users,
    _bloom_oracle(),
)


def events_bloom_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom rollup: sketch each (event_type, day) partition separately,
    OR-merge the per-day word tables up to event_type (bloom_rollup),
    then probe — the incremental-view shape (daily partials roll up;
    history is never rescanned). bit_or is associative/commutative/
    idempotent, so the merged sketch is BYTE-equal to the direct
    per-type sketch and the oracle replays the direct build — a hash
    green proves the Spark-side merge arithmetic, mirroring
    events_kmv_rollup_users (and the retired events_hll_rollup_users,
    whose identity is pinned in tests/test_retired_rows.py)."""
    from flink_streaming_demo_spark.operators.scale import (
        bloom_maybe_contains,
        bloom_partial,
        bloom_rollup,
    )

    ev = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = bloom_partial(ev, ["event_type", "day"], "user_id")
    sketch = bloom_rollup(
        daily.select("event_type", "word", "bits"), ["event_type"]
    )
    cands = _bloom_candidates(ev)
    probes = ev.select("event_type").distinct().crossJoin(cands)
    probed = bloom_maybe_contains(
        sketch, probes, ["event_type"], "user_id"
    )
    return probed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum(F.col("maybe_member").cast("bigint")).alias("n_maybe"),
    )


def _bloom_rollup_oracle() -> str:
    from flink_streaming_demo_spark.operators.scale import (
        sql_bloom_bits,
        sql_bloom_maybe_contains,
    )

    # direct sketch, not the daily rollup: idempotent-OR associativity
    # makes the merged sketch byte-equal, which is the claim under test
    return f"""
    WITH cands AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 7 = 0
    ), probes AS (
        SELECT event_type, user_id
        FROM (SELECT DISTINCT event_type FROM events), cands
    ), sketch AS (
        {sql_bloom_bits("event_type", "user_id", "events")}
    ), probed AS (
        {sql_bloom_maybe_contains("event_type", "user_id", "probes", "sketch")}
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN maybe_member THEN 1 ELSE 0 END)
                AS BIGINT) AS n_maybe
    FROM probed GROUP BY event_type
    """


register(
    "events_bloom_rollup_users",
    events_bloom_rollup_users,
    _bloom_rollup_oracle(),
)


def events_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates: per event_type, sketch per-user
    event counts into a depth x width counter grid
    (operators/scale.cms_partial — the shuffle is bounded by the FIXED
    (row, col) domain, never by the key space), then point-query every
    distinct (event_type, user) and report the estimate next to the
    EXACT count. CMS never under-counts, so cms_count >= n_exact row by
    row — like the Bloom fixture, the one-sided-error contract is part
    of the hash-checked result. 100 TB shape: exact per-key counts
    shuffle the full key space; the sketch shuffles <= depth*width rows
    per group and merges by SUM (events_cms_rollup_users)."""
    from flink_streaming_demo_spark.operators.scale import (
        cms_estimate,
        cms_partial,
    )

    ev = t(spark, sf_dir, "events")
    sketch = cms_partial(ev, ["event_type"], "user_id")
    probes = ev.select("event_type", "user_id").distinct()
    est = cms_estimate(sketch, probes, ["event_type"], "user_id")
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    return est.join(exact, ["event_type", "user_id"]).select(
        "event_type", "user_id", "cms_count", "n_exact"
    )


def _cms_oracle(include_exact: bool) -> str:
    from flink_streaming_demo_spark.operators.scale import (
        sql_cms_counters,
        sql_cms_estimate,
    )

    exact_cols = ", e.n_exact" if include_exact else ""
    exact_join = (
        """
        JOIN (SELECT event_type, user_id,
                     CAST(COUNT(*) AS BIGINT) AS n_exact
              FROM events WHERE user_id IS NOT NULL
              GROUP BY event_type, user_id) e
        USING (event_type, user_id)
        """
        if include_exact
        else ""
    )
    return f"""
    WITH sketch AS (
        {sql_cms_counters("event_type", "user_id", "events")}
    ), probes AS (
        SELECT DISTINCT event_type, user_id FROM events
        WHERE user_id IS NOT NULL
    ), est AS (
        {sql_cms_estimate("event_type", "user_id", "probes", "sketch")}
    )
    SELECT est.event_type, est.user_id, est.cms_count{exact_cols}
    FROM est {exact_join}
    """


register(
    "events_cms_user_counts",
    events_cms_user_counts,
    _cms_oracle(include_exact=True),
)


def events_cms_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS rollup: sketch each (event_type, day) partition separately,
    SUM-merge the per-day counter grids up to event_type (cms_rollup),
    then point-query — counters are plain sums, so the merged grid
    EQUALS the direct per-type sketch and the oracle replays the direct
    build; a hash green proves the Spark-side merge arithmetic. Fourth
    instance of the partial/rollup/estimate sketch pattern (KMV, HLL,
    Bloom, CMS)."""
    from flink_streaming_demo_spark.operators.scale import (
        cms_estimate,
        cms_partial,
        cms_rollup,
    )

    ev = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = cms_partial(ev, ["event_type", "day"], "user_id")
    sketch = cms_rollup(
        daily.select("event_type", "row", "col", "cnt"), ["event_type"]
    )
    # NULL user_id rows must be excluded to match the oracle's
    # WHERE user_id IS NOT NULL probe frame by construction: the events
    # schema allows NULLs, and an unfiltered distinct would emit a
    # cms_count=0 row the oracle never produces (r10 ADVICE item 1).
    probes = (
        ev.filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    return cms_estimate(sketch, probes, ["event_type"], "user_id")


register(
    "events_cms_rollup_users",
    events_cms_rollup_users,
    _cms_oracle(include_exact=False),
)


def events_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-ACCELERATED exact semi-join: per event_type, count events
    (and sum value) from 'flagged' users — users with at least one
    purchase and user_id % 5 == 0 — where the flagged-set membership
    filter runs as a MAP-SIDE Bloom expression in the scan stage
    (operators/scale.bloom_pruned_semi_join embeds the ~66-word sketch
    as a literal array) before an exact broadcast verify. Bloom has no
    false negatives, so the result is row-identical to the plain
    semi-join — which is exactly what the oracle computes: the driver
    green proves the accelerated path is EXACT, not approximate. At
    100 TB the plain path shuffles the scan; this path moves 66 longs."""
    from flink_streaming_demo_spark.operators.scale import (
        bloom_pruned_semi_join,
    )

    ev = t(spark, sf_dir, "events")
    flagged = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("user_id") % 5 == 0)
        )
        .select("user_id")
        .distinct()
    )
    hits = bloom_pruned_semi_join(ev, flagged, "user_id")
    return hits.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


register(
    "events_bloom_pruned_join",
    events_bloom_pruned_join,
    """
    WITH flagged AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND user_id % 5 = 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE user_id IN (SELECT user_id FROM flagged)
    GROUP BY event_type
    """,
)


HIST_LO, HIST_HI = 0.0, 512.0
HIST_QS = (0.5, 0.9, 0.99)


def events_hist_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram quantiles: p50/p90/p99 of events.value per
    event_type from the fixed-boundary histogram sketch
    (operators/scale.hist_partial + hist_quantiles — the quantile member
    of the KMV/HLL/Bloom/CMS family). Built through the per-day
    partial -> SUM-rollup path, so a hash green proves the merge
    arithmetic AND the interpolation; error is bounded by one bin width
    (8.0 here), and the exact competitor (a global sort) never runs —
    the read side touches <= 64 longs per group."""
    from flink_streaming_demo_spark.operators.scale import (
        hist_partial,
        hist_quantiles,
        hist_rollup,
    )

    ev = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = hist_partial(
        ev, ["event_type", "day"], "value", HIST_LO, HIST_HI
    )
    sketch = hist_rollup(
        daily.select("event_type", "bin", "cnt"), ["event_type"]
    )
    return hist_quantiles(
        sketch, ["event_type"], list(HIST_QS), HIST_LO, HIST_HI
    )


def _hist_oracle() -> str:
    from flink_streaming_demo_spark.operators.scale import (
        sql_hist_counts,
        sql_hist_quantiles,
    )

    return f"""
    WITH sketch AS (
        {sql_hist_counts("event_type", "value", "events", HIST_LO, HIST_HI)}
    )
    {sql_hist_quantiles("event_type", "sketch", list(HIST_QS), HIST_LO, HIST_HI)}
    """


register(
    "events_hist_value_quantiles",
    events_hist_value_quantiles,
    _hist_oracle(),
)


def events_salted_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation IN the driver-checked surface:
    per-user event counts via operators/scale.salted_count — partial
    count per (user, salt) spreads any hot user over 8 reducers, final
    sum moves 8 rows per user. The oracle is the PLAIN group-by count:
    salting must be invisible in the result, which is exactly the
    contract a skew mitigation has to prove before it's safe to deploy
    at a 100 TB shuffle. (events_key_skew_report is the diagnostic that
    decides when to reach for this form.)"""
    from flink_streaming_demo_spark.operators.scale import salted_count

    ev = t(spark, sf_dir, "events")
    return salted_count(ev, "user_id", n_salts=8)


register(
    "events_salted_user_counts",
    events_salted_user_counts,
    """
    SELECT user_id, COUNT(*) AS cnt
    FROM events
    GROUP BY user_id
    """,
)


def events_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of events.value per event_type vs the
    GLOBAL value distribution — the dataset-shift monitor a 100 TB
    pipeline runs per source/segment before mixing: PSI = sum over
    fixed bins of (p_b - q_b) * ln(p_b / q_b), with additive 0.5
    smoothing so empty bins contribute finitely (p = (cnt + 0.5) /
    (n + B/2)). Built on the SAME fixed-boundary histogram sketch as
    events_hist_value_quantiles, so at scale the monitor reads <= 64
    longs per group from maintained partials, never the base table.

    Determinism discipline: the only order-sensitive float reduction
    (the 64-term PSI sum) runs as a SEQUENTIAL fold over the bin-sorted
    term array (F.aggregate here, list_reduce over list(... ORDER BY
    bin) in the oracle) — identical addition order on both engines,
    where a plain SUM would be partial-agg-order-dependent in the last
    ulp. Conventional read: PSI < 0.1 stable, > 0.25 shifted."""
    from flink_streaming_demo_spark.operators.scale import (
        HIST_N_BINS,
        hist_partial,
    )

    ev = t(spark, sf_dir, "events")
    per = hist_partial(ev, ["event_type"], "value", HIST_LO, HIST_HI)
    glob = per.groupBy("bin").agg(F.sum("cnt").alias("gcnt"))
    types = per.groupBy("event_type").agg(F.sum("cnt").alias("n_t"))
    n_g = per.agg(F.sum("cnt").alias("n_g"))
    bins = spark.range(HIST_N_BINS).select(
        F.col("id").cast("int").alias("bin")
    )
    half_b = float(HIST_N_BINS) / 2.0
    dense = (
        types.crossJoin(F.broadcast(bins))
        .join(per, ["event_type", "bin"], "left")
        .join(F.broadcast(glob), "bin", "left")
        .crossJoin(F.broadcast(n_g))
        .select(
            "event_type",
            "bin",
            "n_t",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.coalesce("gcnt", F.lit(0)).alias("gcnt"),
            "n_g",
        )
    )
    p = (F.col("cnt") + F.lit(0.5)) / (
        F.col("n_t").cast("double") + F.lit(half_b)
    )
    q = (F.col("gcnt") + F.lit(0.5)) / (
        F.col("n_g").cast("double") + F.lit(half_b)
    )
    terms = dense.select(
        "event_type",
        "n_t",
        F.struct(F.col("bin"), ((p - q) * F.log(p / q)).alias("term")).alias(
            "_e"
        ),
    )
    psi = F.aggregate(
        F.array_sort(F.collect_list("_e")),
        F.lit(0.0),
        lambda acc, x: acc + x["term"],
    )
    return terms.groupBy("event_type", "n_t").agg(
        F.round(psi, 6).alias("psi")
    ).select(
        "event_type",
        F.col("n_t").alias("n_events"),
        "psi",
        F.when(F.col("psi") > 0.25, F.lit("shifted"))
        .when(F.col("psi") > 0.1, F.lit("drifting"))
        .otherwise(F.lit("stable"))
        .alias("verdict"),
    )


def _psi_oracle() -> str:
    from flink_streaming_demo_spark.operators.scale import (
        HIST_N_BINS,
        sql_hist_counts,
    )

    half_b = float(HIST_N_BINS) / 2.0
    return f"""
    WITH per AS (
        {sql_hist_counts("event_type", "value", "events", HIST_LO, HIST_HI)}
    ),
    gdist AS (SELECT bin, SUM(cnt) AS gcnt FROM per GROUP BY bin),
    types AS (SELECT event_type, SUM(cnt) AS n_t FROM per GROUP BY event_type),
    ng AS (SELECT SUM(cnt) AS n_g FROM per),
    bins AS (SELECT UNNEST(generate_series(0, {HIST_N_BINS - 1})) AS bin),
    dense AS (
        SELECT t.event_type, b.bin, t.n_t,
               COALESCE(p.cnt, 0) AS cnt,
               COALESCE(g.gcnt, 0) AS gcnt,
               ng.n_g
        FROM types t
        CROSS JOIN bins b
        LEFT JOIN per p ON p.event_type = t.event_type AND p.bin = b.bin
        LEFT JOIN gdist g ON g.bin = b.bin
        CROSS JOIN ng
    ),
    terms AS (
        SELECT event_type, n_t,
               bin,
               ((cnt + 0.5) / (CAST(n_t AS DOUBLE) + {half_b!r})
                - (gcnt + 0.5) / (CAST(n_g AS DOUBLE) + {half_b!r}))
               * ln(((cnt + 0.5) / (CAST(n_t AS DOUBLE) + {half_b!r}))
                    / ((gcnt + 0.5) / (CAST(n_g AS DOUBLE) + {half_b!r})))
                   AS term
        FROM dense
    ),
    folded AS (
        SELECT event_type, n_t,
               ROUND(list_reduce(list(term ORDER BY bin),
                                 (a, b) -> a + b), 6) AS psi
        FROM terms
        GROUP BY event_type, n_t
    )
    SELECT event_type,
           CAST(n_t AS BIGINT) AS n_events,
           psi,
           CASE WHEN psi > 0.25 THEN 'shifted'
                WHEN psi > 0.1 THEN 'drifting'
                ELSE 'stable' END AS verdict
    FROM folded
    """


register("events_psi_value_drift", events_psi_value_drift, _psi_oracle())


def events_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-lateness profile of a simulated out-of-order arrival of
    the event stream — the observability query behind every watermark
    delay choice (reference: TaxiRideSource.scala:53-277 serves events
    shuffled within maxServingDelay; SURVEY §2.2 S2). Arrival order is
    simulated deterministically (delay_s = md5(event_id) % 600), the
    watermark is discretized per arrival minute (wm at minute m = max
    event time arrived in minutes < m — the batch analogue of
    per-micro-batch watermark advance), and each event's lateness is
    measured against the watermark of its own arrival minute. The
    per-type profile (late fraction, magnitudes, would-be-dropped count
    at a 60 s allowed-lateness) is exactly what picks
    ``withWatermark``'s delay in streaming/pipelines.py.

    Scale: the only full-width pass is the per-minute partial MAX
    (map-side combine); the minute->watermark cummax runs over one row
    per minute (tiny) and is broadcast back, so the plan is two narrow
    scans + one broadcast join regardless of input size. All arithmetic
    is integer micros (no float drift); `div` is used on both engines
    so the second-floor is engine-identical. Composes operators/
    lateness (with_md5_arrival -> epoch watermark -> integer profile) —
    the same primitives the streaming monitor maintains incrementally
    (streaming/pipelines.streaming_lateness_monitor), so batch profile
    and streaming store are definitionally comparable."""
    from flink_streaming_demo_spark.operators import lateness as L

    ev = L.with_md5_arrival(
        t(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    ).withColumn("arr_min", F.expr("arr_us div 60000000"))
    late = L.lateness_vs_epoch_watermark(
        ev.select("event_type", "ets_us", "arr_min"), "arr_min"
    )
    prof = L.lateness_profile_ints(late)
    return prof.select(
        "event_type",
        "n_events",
        "n_late",
        "max_late_s",
        F.round(
            F.col("sum_late_s").cast("double") / F.col("n_events"), 6
        ).alias("avg_late_s"),
        "n_dropped_60s",
    )


register(
    "events_lateness_profile",
    events_lateness_profile,
    """
    WITH ev AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ets_us,
               epoch_us(CAST(ts AS TIMESTAMP))
               + (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))
                       AS BIGINT) % 600) * 1000000 AS arr_us
        FROM events
    ),
    mins AS (
        SELECT arr_us // 60000000 AS arr_min, MAX(ets_us) AS m_max_us
        FROM ev GROUP BY arr_us // 60000000
    ),
    wm AS (
        SELECT arr_min,
               MAX(m_max_us) OVER (ORDER BY arr_min
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_us
        FROM mins
    ),
    late AS (
        SELECT e.event_type,
               COALESCE(w.wm_us > e.ets_us, FALSE) AS is_late,
               GREATEST(CAST(0 AS BIGINT),
                        COALESCE(w.wm_us - e.ets_us, 0) // 1000000) AS late_s
        FROM ev e JOIN wm w ON e.arr_us // 60000000 = w.arr_min
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           MAX(late_s) AS max_late_s,
           ROUND(CAST(SUM(late_s) AS DOUBLE) / COUNT(*), 6) AS avg_late_s,
           CAST(SUM(CASE WHEN late_s > 60 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped_60s
    FROM late
    GROUP BY event_type
    """,
)


def events_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-style sequence-pattern matching (the MATCH_RECOGNIZE /
    Flink-CEP capability) expressed Spark-first: per user, the
    event-time-ordered type sequence is folded to a compact symbol
    string (one initial per event — initials are unique across the
    five types) and patterns run as REGEXES over that string, entirely
    JVM-side. Two classic patterns: conversions = 'c[^cp]*p' (a click
    followed by a purchase with no intervening click/purchase — CEP
    skip-till-next-match semantics), error bursts = 'ee+' (maximal
    runs of 2+ consecutive errors). Both engines count non-overlapping
    leftmost matches, and both patterns are backtracking-free, so the
    counts are engine-exact.

    Scale: one shuffle on user_id; per-user state is the symbol string
    (bounded by that user's event count — at 100 TB, compose with
    session windows first to bound it per session); the regex pass is
    a map over the aggregated rows. This is the standard key-partition
    MATCH_RECOGNIZE execution shape."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("initial"),
    )
    seqs = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", "initial")
                    )
                ),
                lambda s: s["initial"],
            ),
        ).alias("seq"),
    )
    return seqs.select(
        "user_id",
        "n_events",
        F.regexp_count("seq", F.lit("c[^cp]*p"))
        .cast("bigint")
        .alias("n_conversions"),
        F.regexp_count("seq", F.lit("ee+"))
        .cast("bigint")
        .alias("n_error_bursts"),
    )


register(
    "events_sequence_patterns",
    events_sequence_patterns,
    """
    WITH seqs AS (
        SELECT user_id,
               COUNT(*) AS n_events,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events
        GROUP BY user_id
    )
    SELECT user_id,
           n_events,
           CAST(len(regexp_extract_all(seq, 'c[^cp]*p')) AS BIGINT)
               AS n_conversions,
           CAST(len(regexp_extract_all(seq, 'ee+')) AS BIGINT)
               AS n_error_bursts
    FROM seqs
    """,
)


_WM_CANDIDATE_DELAYS = (0, 30, 60, 120, 300, 600)


def events_watermark_delay_tradeoff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The watermark-delay decision table: for each candidate
    ``withWatermark`` delay, how many events of the simulated
    out-of-order arrival would be DROPPED (lateness beyond the allowed
    delay) vs the result latency you pay (the delay itself) — computed
    in ONE pass over the per-event lateness by exploding the bounded
    candidate list (6 rows per event pre-aggregation, map-side
    combined). This is the query you read before picking the delay the
    streaming pipelines hardcode; events_lateness_profile gives the
    distribution, this gives the operating points.

    Scale: same two narrow scans + broadcast watermark join as the
    profile; the explode multiplies rows by a CONSTANT 6 before the
    partial agg, so shuffle stays 6x the per-type key space, not 6x
    the data."""
    from flink_streaming_demo_spark.operators import lateness as L

    ev = L.with_md5_arrival(
        t(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    ).withColumn("arr_min", F.expr("arr_us div 60000000"))
    late = L.lateness_vs_epoch_watermark(
        ev.select("event_type", "ets_us", "arr_min"), "arr_min"
    )
    cand = late.select(
        "late_s",
        F.explode(
            F.array(*[F.lit(d) for d in _WM_CANDIDATE_DELAYS])
        ).alias("delay_s"),
    )
    n = F.count(F.lit(1))
    return cand.groupBy("delay_s").agg(
        n.alias("n_events"),
        F.sum((F.col("late_s") > F.col("delay_s")).cast("int"))
        .cast("bigint")
        .alias("n_dropped"),
        F.round(
            F.sum((F.col("late_s") > F.col("delay_s")).cast("int"))
            / n.cast("double"),
            6,
        ).alias("drop_frac"),
    )


register(
    "events_watermark_delay_tradeoff",
    events_watermark_delay_tradeoff,
    f"""
    WITH ev AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ets_us,
               epoch_us(CAST(ts AS TIMESTAMP))
               + (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))
                       AS BIGINT) % 600) * 1000000 AS arr_us
        FROM events
    ),
    mins AS (
        SELECT arr_us // 60000000 AS arr_min, MAX(ets_us) AS m_max_us
        FROM ev GROUP BY arr_us // 60000000
    ),
    wm AS (
        SELECT arr_min,
               MAX(m_max_us) OVER (ORDER BY arr_min
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_us
        FROM mins
    ),
    late AS (
        SELECT GREATEST(CAST(0 AS BIGINT),
                        COALESCE(w.wm_us - e.ets_us, 0) // 1000000) AS late_s
        FROM ev e JOIN wm w ON e.arr_us // 60000000 = w.arr_min
    ),
    cand AS (
        SELECT late_s,
               unnest(ARRAY{list(_WM_CANDIDATE_DELAYS)}) AS delay_s
        FROM late
    )
    SELECT delay_s,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN late_s > delay_s THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
           ROUND(CAST(SUM(CASE WHEN late_s > delay_s THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS drop_frac
    FROM cand
    GROUP BY delay_s
    """,
)


# --- Rolling-window distinct from per-day KMV partials -------------------------

def events_kmv_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day ROLLING distinct users per day from per-day KMV partials —
    the sliding-window distinct a dashboard actually serves (WAU from
    daily sketches): sketch each day once, then every window is a
    ⊕-merge of <= 7 tiny partials; history is never rescanned and a new
    day costs one day's sketch plus 7 merges. The fan-out (each day's
    partial contributes to the 7 window-ends it falls in) is a bounded
    array expression; by merge associativity the merged sketch EQUALS
    the direct sketch over the window's events, so the oracle replays
    the window's k-smallest order statistics directly — a green hash
    proves the merge arithmetic, not just the single-shot sketch.

    100 TB shape: the only data-sized work is the per-day partial (one
    distinct + partitioned top-k, same as events_kmv_distinct_users);
    everything after runs on <= 7 * k doubles per window-end."""
    from flink_streaming_demo_spark.operators.scale import (
        kmv_estimate,
        kmv_partial,
        kmv_rollup,
    )

    ev = t(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("DAY", F.col("ts"))
    )
    daily = kmv_partial(ev, ["day"], "user_id")
    fan = daily.select(
        F.explode(
            F.expr(
                "sequence(day, day + interval 6 days, interval 1 day)"
            )
        ).alias("win_day"),
        "kmv",
    )
    rolled = kmv_rollup(fan, ["win_day"])
    observed = daily.select(F.col("day").alias("win_day"))
    return (
        kmv_estimate(rolled.join(observed, "win_day"))
        .select("win_day", "n_sampled", "kmv_distinct")
    )


def _kmv_rolling_oracle() -> str:
    from flink_streaming_demo_spark.operators.scale import (
        KMV_K,
        _KMV_SCALE,
    )

    return f"""
    WITH du AS (
        SELECT DISTINCT
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) / {_KMV_SCALE!r} AS u
        FROM events
        WHERE user_id IS NOT NULL
    ),
    days AS (SELECT DISTINCT day AS win_day FROM du),
    fan AS (
        SELECT DISTINCT d.win_day, du.u
        FROM days d
        JOIN du ON du.day BETWEEN d.win_day - INTERVAL 6 DAY
                               AND d.win_day
    ),
    rk AS (
        SELECT win_day, u,
               ROW_NUMBER() OVER (PARTITION BY win_day ORDER BY u) AS rn
        FROM fan
    )
    SELECT win_day,
           CAST(COUNT(*) AS INT) AS n_sampled,
           CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS BIGINT)
                ELSE CAST(FLOOR({float(KMV_K - 1)!r} / MAX(u)) AS BIGINT)
           END AS kmv_distinct
    FROM rk
    WHERE rn <= {KMV_K}
    GROUP BY win_day
    """


register(
    "events_kmv_rolling_distinct",
    events_kmv_rolling_distinct,
    _kmv_rolling_oracle(),
)


# --- Funnel stage-transition latency quantiles (histogram sketch) --------------

LAT_LO, LAT_HI = 0.0, 512.0  # hours; 64 bins of 8h
LAT_QS = (0.5, 0.9, 0.99)


def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert quantiles per funnel transition (view→click,
    click→purchase): median/p90/p99 hours, computed on the SAME
    fixed-boundary histogram sketch as events_hist_value_quantiles —
    at 100 TB the latency distribution summarizes to <= 64 longs per
    transition from maintained partials, where an exact per-transition
    quantile would sort every conversion. Latency = epoch-seconds
    difference / 3600 (identical arithmetic in the oracle); the funnel
    itself is the registered events_funnel_stages chain (its oracle SQL
    is composed verbatim below, so the grader stays definitionally in
    sync)."""
    from flink_streaming_demo_spark.operators.scale import (
        hist_partial,
        hist_quantiles,
    )

    f = events_funnel_stages(spark, sf_dir)
    hours = lambda a, b: (
        F.col(b).cast("double") - F.col(a).cast("double")
    ) / F.lit(3600.0)
    lat = (
        f.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("view_to_click").alias("transition"),
                        hours("t_view", "t_click").alias("lat_h"),
                    ),
                    F.struct(
                        F.lit("click_to_purchase").alias("transition"),
                        hours("t_click", "t_purchase").alias("lat_h"),
                    ),
                )
            ).alias("x")
        )
        .select("x.*")
        .filter(F.col("lat_h").isNotNull())
    )
    sk = hist_partial(lat, ["transition"], "lat_h", LAT_LO, LAT_HI)
    return hist_quantiles(
        sk, ["transition"], list(LAT_QS), LAT_LO, LAT_HI
    )


def _funnel_latency_oracle() -> str:
    from flink_streaming_demo_spark.operators.scale import (
        sql_hist_counts,
        sql_hist_quantiles,
    )
    from flink_streaming_demo_spark.plans.registry import ORACLE_SQL

    funnel = ORACLE_SQL["events_funnel_stages"]
    return f"""
    WITH funnel AS ({funnel}),
    lat AS (
        SELECT transition, lat_h
        FROM (
            SELECT 'view_to_click' AS transition,
                   (epoch(t_click) - epoch(t_view)) / 3600.0 AS lat_h
            FROM funnel
            UNION ALL
            SELECT 'click_to_purchase',
                   (epoch(t_purchase) - epoch(t_click)) / 3600.0
            FROM funnel
        )
        WHERE lat_h IS NOT NULL
    ),
    sketch AS (
        {sql_hist_counts("transition", "lat_h", "lat", LAT_LO, LAT_HI)}
    )
    {sql_hist_quantiles("transition", "sketch", list(LAT_QS),
                        LAT_LO, LAT_HI)}
    """


register(
    "events_funnel_latency",
    events_funnel_latency,
    _funnel_latency_oracle(),
)


def events_hll_rolling_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct users from per-day HLL register partials —
    the KMV rolling query's register-sketch sibling
    (events_kmv_rolling_distinct): per-day registers fan out to the <= 7
    window-ends they fall in, merge by per-bucket MAX (idempotent, so
    overlap between windows is free), estimate at read time. By MAX
    associativity the merged registers EQUAL the direct sketch over the
    window's events, so the oracle replays the window directly. State
    per window-end: <= 256 (bucket, rho) pairs."""
    from flink_streaming_demo_spark.operators.scale import (
        hll_estimate,
        hll_partial,
        hll_rollup,
    )

    ev = t(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("DAY", F.col("ts"))
    )
    daily = hll_partial(ev, ["day"], "user_id")
    fan = daily.select(
        F.explode(
            F.expr("sequence(day, day + interval 6 days, interval 1 day)")
        ).alias("win_day"),
        "bucket",
        "rho",
    )
    rolled = hll_rollup(fan, ["win_day"])
    observed = daily.select(F.col("day").alias("win_day")).distinct()
    return hll_estimate(rolled.join(observed, "win_day"), ["win_day"])


def _hll_rolling_oracle() -> str:
    from flink_streaming_demo_spark.operators.scale import (
        sql_hll_estimate_from_registers,
        sql_hll_registers,
    )

    return f"""
    WITH base AS (
        SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, user_id
        FROM events WHERE user_id IS NOT NULL
    ),
    days AS (SELECT DISTINCT day AS win_day FROM base),
    win AS (
        SELECT d.win_day, b.user_id
        FROM days d
        JOIN base b ON b.day BETWEEN d.win_day - INTERVAL 6 DAY
                               AND d.win_day
    ),
    regs AS (
        {sql_hll_registers("win_day", "user_id", "win")}
    )
    {sql_hll_estimate_from_registers("win_day", "regs")}
    """


register(
    "events_hll_rolling_users",
    events_hll_rolling_users,
    _hll_rolling_oracle(),
)


# --- A/B experiment readout (two-sample z per metric segment) ------------------

def events_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout per event_type: users split into two arms
    by the deterministic md5 bucket (the same engine-portable
    assignment sample_hash_split uses — assignment survives re-runs
    and engine moves, the property rand() splits lack), then per-arm
    mean event value, difference, Welch z-score and a |z| > 1.96 flag.
    The analysis pass every experimentation platform runs on the
    warehouse.

    Determinism: per-arm first/second moments are exact DECIMAL sums of
    1e-6-quantized values (the covariance discipline), so means,
    variances and the z-score derive from bit-identical doubles via one
    shared formula; sqrt is a single IEEE op. One partial-aggregated
    scan, map-side conditional sums, #event_types output rows."""
    from flink_streaming_demo_spark.operators.sampling import hash_bucket

    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    arm_a = (hash_bucket(F.col("user_id")) % 2) == 0
    v = F.col("value").cast("double")
    qv = F.round(v * F.lit(1e6), 0).cast("decimal(38,0)")
    qvv = F.round(v * v * F.lit(1e6), 0).cast("decimal(38,0)")
    z = lambda cond, col: F.sum(F.when(cond, col).otherwise(F.lit(0).cast("decimal(38,0)")))
    agg = ev.groupBy("event_type").agg(
        F.sum(arm_a.cast("long")).alias("n_a"),
        F.sum((~arm_a).cast("long")).alias("n_b"),
        z(arm_a, qv).alias("s_a"),
        z(~arm_a, qv).alias("s_b"),
        z(arm_a, qvv).alias("ss_a"),
        z(~arm_a, qvv).alias("ss_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = F.col("s_a").cast("double") / F.lit(1e6) / na
    mb = F.col("s_b").cast("double") / F.lit(1e6) / nb
    va = F.col("ss_a").cast("double") / F.lit(1e6) / na - ma * ma
    vb = F.col("ss_b").cast("double") / F.lit(1e6) / nb - mb * mb
    zscore = (ma - mb) / F.sqrt(va / na + vb / nb)
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(ma - mb, 6).alias("diff"),
        F.round(zscore, 6).alias("z_score"),
        (F.abs(zscore) > F.lit(1.96)).alias("significant"),
    )


register(
    "events_ab_test_report",
    events_ab_test_report,
    """
    WITH q AS (
        SELECT event_type,
               (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 1000000) % 2 = 0 AS arm_a,
               CAST(ROUND(CAST(value AS DOUBLE) * 1e6, 0)
                    AS DECIMAL(38,0)) AS qv,
               CAST(ROUND(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                          * 1e6, 0) AS DECIMAL(38,0)) AS qvv
        FROM events WHERE user_id IS NOT NULL
    ),
    agg AS (
        SELECT event_type,
               SUM(CASE WHEN arm_a THEN 1 ELSE 0 END) AS n_a,
               SUM(CASE WHEN arm_a THEN 0 ELSE 1 END) AS n_b,
               SUM(CASE WHEN arm_a THEN qv
                        ELSE CAST(0 AS DECIMAL(38,0)) END) AS s_a,
               SUM(CASE WHEN arm_a THEN CAST(0 AS DECIMAL(38,0))
                        ELSE qv END) AS s_b,
               SUM(CASE WHEN arm_a THEN qvv
                        ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss_a,
               SUM(CASE WHEN arm_a THEN CAST(0 AS DECIMAL(38,0))
                        ELSE qvv END) AS ss_b
        FROM q GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           ROUND(CAST(s_a AS DOUBLE) / 1e6 / CAST(n_a AS DOUBLE), 6)
               + 0.0 AS mean_a,
           ROUND(CAST(s_b AS DOUBLE) / 1e6 / CAST(n_b AS DOUBLE), 6)
               + 0.0 AS mean_b,
           ROUND(CAST(s_a AS DOUBLE) / 1e6 / CAST(n_a AS DOUBLE)
                 - CAST(s_b AS DOUBLE) / 1e6 / CAST(n_b AS DOUBLE), 6)
               + 0.0 AS diff,
           ROUND((CAST(s_a AS DOUBLE) / 1e6 / CAST(n_a AS DOUBLE)
                  - CAST(s_b AS DOUBLE) / 1e6 / CAST(n_b AS DOUBLE))
                 / SQRT((CAST(ss_a AS DOUBLE) / 1e6 / CAST(n_a AS DOUBLE)
                         - (CAST(s_a AS DOUBLE) / 1e6 / CAST(n_a AS DOUBLE))
                           * (CAST(s_a AS DOUBLE) / 1e6 / CAST(n_a AS DOUBLE)))
                        / CAST(n_a AS DOUBLE)
                        + (CAST(ss_b AS DOUBLE) / 1e6 / CAST(n_b AS DOUBLE)
                           - (CAST(s_b AS DOUBLE) / 1e6 / CAST(n_b AS DOUBLE))
                             * (CAST(s_b AS DOUBLE) / 1e6 / CAST(n_b AS DOUBLE)))
                          / CAST(n_b AS DOUBLE)), 6) + 0.0 AS z_score,
           ABS((CAST(s_a AS DOUBLE) / 1e6 / CAST(n_a AS DOUBLE)
                - CAST(s_b AS DOUBLE) / 1e6 / CAST(n_b AS DOUBLE))
               / SQRT((CAST(ss_a AS DOUBLE) / 1e6 / CAST(n_a AS DOUBLE)
                       - (CAST(s_a AS DOUBLE) / 1e6 / CAST(n_a AS DOUBLE))
                         * (CAST(s_a AS DOUBLE) / 1e6 / CAST(n_a AS DOUBLE)))
                      / CAST(n_a AS DOUBLE)
                      + (CAST(ss_b AS DOUBLE) / 1e6 / CAST(n_b AS DOUBLE)
                         - (CAST(s_b AS DOUBLE) / 1e6 / CAST(n_b AS DOUBLE))
                           * (CAST(s_b AS DOUBLE) / 1e6 / CAST(n_b AS DOUBLE)))
                        / CAST(n_b AS DOUBLE))) > 1.96 AS significant
    FROM agg
    """,
)


# --- Purchase attribution (first/last touch) ------------------------------------

ATTR_LOOKBACK_S = 7 * 86400


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-purchase click attribution within a 7-day lookback: each
    purchase joins its user's clicks in (t_purchase − 7d, t_purchase),
    and FIRST-touch / LAST-touch credit goes to the earliest / latest
    such click — the marketing-attribution join every events warehouse
    serves (funnel's per-USER cousin; this one is per CONVERSION).

    100 TB shape: an equi join on user_id with the time bounds as join
    predicates (the events_error_after_click interval-join shape — the
    plan guard proves it stays an equi join, never a nested loop),
    then one partial-aggregated groupBy(purchase). Purchases without
    any in-window click report zero touches (left join, the
    'organic conversion' row every attribution report needs)."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("revenue"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    joined = purchases.alias("p").join(
        clicks.alias("c"),
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("c.c_ts") < F.col("p.p_ts"))
        & (
            F.col("c.c_ts")
            >= F.col("p.p_ts")
            - F.expr(f"interval {ATTR_LOOKBACK_S} seconds")
        ),
        "left",
    )
    agg = joined.groupBy(
        "purchase_id", F.col("p.user_id").alias("user_id"), "p_ts",
        "revenue"
    ).agg(
        F.count("click_id").alias("n_touches"),
        F.min(F.struct("c_ts", "click_id")).alias("_first"),
        F.max(F.struct("c_ts", "click_id")).alias("_last"),
    )
    return agg.select(
        "purchase_id",
        "user_id",
        F.col("p_ts").alias("purchase_ts"),
        F.round(F.col("revenue"), 2).alias("revenue"),
        F.col("n_touches").cast("bigint").alias("n_touches"),
        F.col("_first.click_id").alias("first_touch_click"),
        F.col("_last.click_id").alias("last_touch_click"),
    )


register(
    "events_attribution",
    events_attribution,
    f"""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id,
               CAST(ts AS TIMESTAMP) AS p_ts, value AS revenue
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, event_id AS click_id,
               CAST(ts AS TIMESTAMP) AS c_ts
        FROM events WHERE event_type = 'click'
    )
    SELECT p.purchase_id, p.user_id,
           p.p_ts AS purchase_ts,
           ROUND(p.revenue, 2) AS revenue,
           CAST(COUNT(c.click_id) AS BIGINT) AS n_touches,
           MIN({{'t': c.c_ts, 'id': c.click_id}}).id AS first_touch_click,
           MAX({{'t': c.c_ts, 'id': c.click_id}}).id AS last_touch_click
    FROM p
    LEFT JOIN c ON c.user_id = p.user_id
                AND c.c_ts < p.p_ts
                AND c.c_ts >= p.p_ts - INTERVAL {ATTR_LOOKBACK_S} SECONDS
    GROUP BY p.purchase_id, p.user_id, p.p_ts, p.revenue
    """,
)


# --- Rolling-window sketch views, part 2 (histogram + CMS) -------------------
#
# r10 added the rolling 7-day forms of the two DISTINCT sketches (KMV,
# HLL). These two close the family: every mergeable sketch in
# operators/scale.py now has a rolling-window view built the same way —
# sketch each day once, fan the day's partial to the <= 7 window-ends it
# falls in (bounded array expression), ⊕-merge per window-end, estimate
# at read time. History is never rescanned; a new day costs one day's
# sketch plus 7 merges. The streaming consumers get the identical tables
# from the per-day maintainer stores via streaming/pipelines' rolling
# views (same fan-out + rollup on read).

def events_hist_rolling_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """7-day ROLLING p50/p90/p99 of events.value per day from per-day
    histogram-bin partials — the trailing-window latency/score dashboard
    quantile: bins merge by SUM (associative), so the merged window
    sketch EQUALS the direct sketch over the window's events and the
    oracle replays each window directly; a green hash proves the rolling
    merge arithmetic AND the interpolation. Read side touches <= 7 * 64
    longs per window-end; the only data-sized work is the per-day
    partial."""
    from flink_streaming_demo_spark.operators.scale import (
        hist_partial,
        hist_quantiles,
        hist_rollup,
    )

    ev = t(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("DAY", F.col("ts"))
    )
    daily = hist_partial(ev, ["day"], "value", HIST_LO, HIST_HI)
    fan = daily.select(
        F.explode(
            F.expr("sequence(day, day + interval 6 days, interval 1 day)")
        ).alias("win_day"),
        "bin",
        "cnt",
    )
    rolled = hist_rollup(fan, ["win_day"])
    observed = daily.select(F.col("day").alias("win_day")).distinct()
    return hist_quantiles(
        rolled.join(observed, "win_day"),
        ["win_day"],
        list(HIST_QS),
        HIST_LO,
        HIST_HI,
    )


def _hist_rolling_oracle() -> str:
    from flink_streaming_demo_spark.operators.scale import (
        sql_hist_counts,
        sql_hist_quantiles,
    )

    return f"""
    WITH base AS (
        SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, value
        FROM events
    ),
    days AS (SELECT DISTINCT day AS win_day FROM base),
    win AS (
        SELECT d.win_day, b.value
        FROM days d
        JOIN base b ON b.day BETWEEN d.win_day - INTERVAL 6 DAY
                               AND d.win_day
    ),
    sketch AS (
        {sql_hist_counts("win_day", "value", "win", HIST_LO, HIST_HI)}
    )
    {sql_hist_quantiles("win_day", "sketch", list(HIST_QS), HIST_LO, HIST_HI)}
    """


register(
    "events_hist_rolling_quantiles",
    events_hist_rolling_quantiles,
    _hist_rolling_oracle(),
)


def events_cms_rolling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day ROLLING per-user event-count estimates: sketch each day's
    events into a CMS counter grid once, SUM-merge the <= 7 grids per
    window-end, then point-query each day's ACTIVE users against their
    trailing-7-day grid — 'how often has today's user been here this
    week' without shuffling the (day x user) key space. Counters merge
    by SUM, so the merged grid EQUALS the direct window grid and the
    oracle replays each window directly. Probes are NULL-filtered to
    match the oracle by construction (the sibling-query lesson from r10
    ADVICE #1)."""
    from flink_streaming_demo_spark.operators.scale import (
        cms_estimate,
        cms_partial,
        cms_rollup,
    )

    ev = t(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("DAY", F.col("ts"))
    )
    daily = cms_partial(ev, ["day"], "user_id")
    fan = daily.select(
        F.explode(
            F.expr("sequence(day, day + interval 6 days, interval 1 day)")
        ).alias("win_day"),
        "row",
        "col",
        "cnt",
    )
    rolled = cms_rollup(fan, ["win_day"])
    probes = (
        ev.filter(F.col("user_id").isNotNull())
        .select(F.col("day").alias("win_day"), "user_id")
        .distinct()
    )
    return cms_estimate(rolled, probes, ["win_day"], "user_id")


def _cms_rolling_oracle() -> str:
    from flink_streaming_demo_spark.operators.scale import (
        sql_cms_counters,
        sql_cms_estimate,
    )

    return f"""
    WITH base AS (
        SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, user_id
        FROM events
        WHERE user_id IS NOT NULL
    ),
    days AS (SELECT DISTINCT day AS win_day FROM base),
    win AS (
        SELECT d.win_day, b.user_id
        FROM days d
        JOIN base b ON b.day BETWEEN d.win_day - INTERVAL 6 DAY
                               AND d.win_day
    ),
    sketch AS (
        {sql_cms_counters("win_day", "user_id", "win")}
    ),
    probes AS (SELECT DISTINCT day AS win_day, user_id FROM base),
    est AS (
        {sql_cms_estimate("win_day", "user_id", "probes", "sketch")}
    )
    SELECT win_day, user_id, cms_count FROM est
    """


register(
    "events_cms_rolling_counts",
    events_cms_rolling_counts,
    _cms_rolling_oracle(),
)
