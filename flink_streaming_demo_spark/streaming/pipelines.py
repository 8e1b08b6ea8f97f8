"""Structured Streaming variants of the three demo apps.

The *same* transformation chains as plans/taxi_apps.py, applied to a
streaming DataFrame — the point of the Spark-first design: one logical plan,
batch or incremental physical execution chosen by the engine.

Output-mode mapping (SURVEY §3):

* App 1 (running total, per-record emission — reference:
  examples/TotalArrivalCount.scala:75-80): ``update`` output mode — every
  changed cell re-emits per micro-batch, the micro-batch analogue of Flink's
  per-record fold emission. Combined with a keyed upsert sink (K3) the
  observable behavior is identical: last write per cell wins.
* App 2 (sliding window, fire at watermark — reference:
  examples/SlidingArrivalCount.scala:81-93): ``append`` mode after
  ``withWatermark`` — results emit exactly once when the watermark passes
  window end, Flink's default event-time trigger.
* App 3 (early firing — reference: examples/EarlyArrivalCount.scala:117-160):
  ``update`` mode emits time-driven partials (every micro-batch); the exact
  *count-driven* cadence lives in streaming/early_trigger.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_streaming_demo_spark.functions import geo, text as TX
from flink_streaming_demo_spark.plans.taxi_apps import arrival_events


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "60 seconds",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key arriving
    within the watermark horizon (`dropDuplicatesWithinWatermark`). The
    streaming tier of the dedup ladder (operators/dedup.py is the batch
    tier): state per key is bounded by the watermark — at 100 TB/day the
    state store holds only one horizon's worth of keys, not history."""
    return events.withWatermark(ts_col, watermark_delay) \
        .dropDuplicatesWithinWatermark(key_cols)


def streaming_session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark_delay: str = "60 seconds",
) -> DataFrame:
    """Gap-based session windows in streaming: `session_window` merges
    events within `gap` of each other into one growing window per key;
    sessions finalize (append mode) once the watermark passes session end +
    gap. The batch analogue is the lag/running-sum sessionization in
    plans/event_queries.py — same sessions, different mechanism."""
    agg = (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.session_window(F.col(ts_col), gap), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return agg.select(
        F.col(key_col),
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        F.col("n_events"),
    )


def streaming_clean_corpus_front(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    watermark_delay: str = "60 seconds",
) -> DataFrame:
    """Streaming front half of plans/text_queries.pipeline_clean_corpus:
    the quality gate (SAME predicate as the batch pipeline — a stateless
    filter on the stream) followed by exact content dedup via
    ``dropDuplicatesWithinWatermark`` on the md5 text hash. Emits one
    (text_hash, doc_id, n_tokens) row per new content hash; attach a
    parquet upsert sink keyed by text_hash so a re-emission of a hash
    whose first arrival fell OUTSIDE the watermark horizon merges
    idempotently — the sink, not the engine, closes the
    beyond-horizon-duplicate gap (the same division of labor as the
    reference's upsert sinks, SURVEY §3.3).

    Scale: state per key lives only one watermark horizon
    (vs unbounded ``dropDuplicates``); quality filter and hashing are
    map-only on the micro-batch. The back half (LSH near-dup + connected
    components) needs global pairwise structure and stays a periodic
    batch pass over the sink's table — the standard lambda split for
    dedup at ingest.
    """
    quality = docs.filter(TX.quality_pass(F.col("text")))
    hashed = quality.withColumn("text_hash", F.md5("text"))
    deduped = streaming_dedup(
        hashed, ["text_hash"], ts_col=ts_col, watermark_delay=watermark_delay
    )
    return deduped.select(
        "text_hash",
        "doc_id",
        F.col(ts_col),
        TX.token_count(F.col("text")).alias("n_tokens"),
        # text rides along so the periodic batch back half
        # (clean_corpus_compact) can compute near-dup signatures over
        # the store without a second pass at the raw source
        "text",
    )


def clean_corpus_compact(store_docs: DataFrame,
                         threshold: float = 0.5) -> DataFrame:
    """The periodic batch back half over the streaming ingest store:
    transitive near-dup removal (MinHash-LSH -> connected components ->
    one survivor per cluster) via the SAME operator the batch pipeline
    uses (operators/dedup.drop_neardup_clusters). Quality filtering and
    exact dedup already happened at ingest (streaming_clean_corpus_front),
    so compaction touches only content-distinct survivors — the standard
    lambda split: per-record decisions stream, global pairwise structure
    batches. Idempotent, so it can run on any cadence over the live
    store."""
    from flink_streaming_demo_spark.operators.dedup import (
        drop_neardup_clusters,
    )

    return drop_neardup_clusters(store_docs, threshold=threshold)


def streaming_total_arrival_count(rides: DataFrame) -> DataFrame:
    """App 1 streaming: unbounded keyed running aggregate (use with
    outputMode('update') + upsert sink keyed by cell)."""
    agg = arrival_events(rides).groupBy("cell").agg(
        F.max("ts").alias("max_ts"),
        F.sum("passenger_cnt").cast("bigint").alias("cnt"),
    )
    return agg.select(
        "cell",
        "max_ts",
        geo.cell_center_lon(F.col("cell")).alias("center_lon"),
        geo.cell_center_lat(F.col("cell")).alias("center_lat"),
        "cnt",
    )


def streaming_sliding_arrival_count(
    rides: DataFrame,
    watermark_delay: str = "60 seconds",
    window: str = "15 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """App 2 streaming: watermarked sliding event-time window (use with
    outputMode('append') — emits once per window at watermark passage, or
    outputMode('update') for time-driven early partials ≈ App 3).

    The watermark delay mirrors the reference's maxServingDelay=60s
    (reference: examples/SlidingArrivalCount.scala:49) and its bounded-delay
    watermark contract (reference: sources/TaxiRideSource.scala:195,258).
    """
    agg = (
        rides.withWatermark("ts", watermark_delay)
        .transform(arrival_events)
        .groupBy(F.window(F.col("ts"), window, slide), F.col("cell"))
        .agg(F.sum("passenger_cnt").cast("bigint").alias("cnt"))
    )
    return agg.select(
        F.col("cell"),
        F.col("window.end").alias("window_end"),
        geo.cell_center_lon(F.col("cell")).alias("center_lon"),
        geo.cell_center_lat(F.col("cell")).alias("center_lat"),
        F.col("cnt"),
    )


def streaming_error_after_click(
    clicks: DataFrame,
    errors: DataFrame,
    watermark_delay: str = "60 seconds",
) -> DataFrame:
    """Stream-stream interval join: the batch error_after_click plan
    (plans/event_queries.py) applied to two watermarked streams. The
    time-range condition (error in (click, click + horizon]) is what
    lets Structured Streaming bound both join-state buffers: a click
    older than watermark - horizon can never match a future error and
    is evicted; matches emit as they are found (inner join, append).
    One state-store shuffle on user_id — the same exchange the batch
    sort-merge join performs."""
    from flink_streaming_demo_spark.plans.event_queries import (
        error_after_click,
    )

    return error_after_click(
        clicks.withWatermark("ts", watermark_delay),
        errors.withWatermark("ts", watermark_delay),
    )


def streaming_error_after_click_outer(
    clicks: DataFrame,
    errors: DataFrame,
    watermark_delay: str = "60 seconds",
) -> DataFrame:
    """LEFT-OUTER stream-stream interval join: matched (click, error)
    pairs emit as they are found, and a click with NO in-horizon error
    emits once — with NULL error columns — when the watermark passes
    click_ts + horizon and its join state is evicted. That NULL-on-
    eviction emission is the semantics corner the inner form never
    exercises: the engine must prove absence, not just presence, and it
    can only do so when the watermark guarantees no matching error can
    still arrive. Same bounded state as the inner join (both buffers
    evict on the watermark + range condition)."""
    from flink_streaming_demo_spark.plans.event_queries import (
        error_after_click,
    )

    return error_after_click(
        clicks.withWatermark("ts", watermark_delay),
        errors.withWatermark("ts", watermark_delay),
        how="leftOuter",
    )


def streaming_enrich_with_static(
    events: DataFrame,
    dim: DataFrame,
    key: str = "event_type",
    watermark_delay: str = "60 seconds",
) -> DataFrame:
    """Stream-static enrichment: a streaming fact joined to a static
    (batch) dimension, then a watermarked tumbling aggregate of the
    enriched value. The static side is planned per micro-batch as an
    ordinary broadcast hash join — no state store is involved for the
    join itself (only the downstream window aggregate keeps state),
    which is why stream-static is the default enrichment shape at any
    scale: dimension updates just show up in the next micro-batch."""
    enriched = events.withWatermark("ts", watermark_delay).join(
        F.broadcast(dim), key
    )
    agg = enriched.groupBy(
        F.window("ts", "1 hour"), F.col(key)
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value") * F.col("weight")), 6).alias(
            "weighted_value"
        ),
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        key,
        "n_events",
        "weighted_value",
    )


def streaming_incremental_dedup(
    base: DataFrame,
    sink,
    threshold: float = 0.5,
):
    """foreachBatch body for ingest-time dedup of a document stream
    against a STATIC existing corpus: every micro-batch runs
    operators/dedup.incremental_dedup_decisions (exact content-hash ->
    MinHash-LSH near -> new, matched base id) and upserts the verdicts
    keyed by doc_id. Because verdicts depend only on (doc, base) — no
    cross-batch state — the streaming result converges to the batch
    operator over the same incoming set regardless of chunking or
    arrival order; the equivalence test pins that.

    Compose after ``streaming_dedup`` (dropDuplicatesWithinWatermark on
    the content hash) when the stream itself may repeat content: intra-
    stream dedup is the engine's watermark-bounded state, corpus-level
    dedup is this batch-per-trigger check — same division of labor as
    streaming_clean_corpus_front.

    Scale: the micro-batch is small by construction, so both probe joins
    broadcast it against the (in production: precomputed, bucketed) base
    index — the base is never shuffled per trigger.
    """
    from flink_streaming_demo_spark.operators.dedup import (
        build_incremental_index,
        incremental_dedup_decisions,
    )

    # Build the batch-invariant base index ONCE, materialized via
    # localCheckpoint so no trigger recomputes the corpus-wide hashing/
    # signature pass (it was re-running per micro-batch before).
    bh, bband = build_incremental_index(base)
    index = (bh.localCheckpoint(), bband.localCheckpoint())

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.head(1):
            return
        # micro-batches are trigger-bounded: always broadcast-size
        verdicts = incremental_dedup_decisions(
            base, batch_df, threshold=threshold, index=index,
            broadcast_incoming=True,
        )
        sink.foreach_batch(verdicts, epoch_id)

    return body


def write_foreach_batch_stream(stream: DataFrame, body, query_name: str):
    """Attach a custom foreachBatch body (e.g.
    streaming_incremental_dedup) to a stream."""
    return (
        stream.writeStream.outputMode("append")
        .queryName(query_name)
        .foreachBatch(body)
        .start()
    )


def streaming_quality_scores(
    stream: DataFrame,
    weights: DataFrame,
) -> DataFrame:
    """Score a document stream with the TRAINED logistic-regression
    quality classifier (operators/classify): the 1-row weight table is a
    static broadcast side of a stream-static join, so scoring is
    map-only per micro-batch — the standard "train offline, score at
    ingest" split. Emits (doc_id, score, pred) per document; batch
    scoring over the same docs is the equivalence oracle."""
    from flink_streaming_demo_spark.operators.classify import (
        logreg_score,
        quality_features,
    )

    feats = quality_features(stream)
    return logreg_score(feats, weights).select("doc_id", "score", "pred")


def streaming_kmv_distinct(
    sink,
    group_cols: list[str],
    key_col: str,
    k: int = None,
):
    """foreachBatch body maintaining a KMV distinct sketch table over a
    stream: per micro-batch, sketch the batch (operators/scale.kmv_partial),
    ⊕-merge with the store's current per-group state, and upsert the merged
    rows. Because KMV merge is IDEMPOTENT on duplicate keys (same key ->
    same hash fraction; the union re-takes the k smallest), a micro-batch
    replayed after a crash re-merges to the identical state — effective
    exactly-once from the sketch algebra alone, no dedup bookkeeping. The
    test pins body(b); body(b) == body(b).

    Scale: per trigger the batch sketch is trigger-bounded, and the store
    side of the merge is SEMI-JOINED to the batch's group keys before
    merging, so only touched groups feed the merge and the upsert — the
    sink's dynamic-partition overwrite then rewrites only the touched
    buckets, never the whole table (the store scan itself stays a plain
    parquet read; bucket-level read pruning is the sink's concern on its
    own merge path). State per group is <= k doubles regardless of
    stream length — the incremental form of the batch rollup (kmv_merge
    over per-day partials).

    Requires a STORE-BACKED sink (ParquetUpsertSink): the merge step
    reads the sink's current state back via ``sink.path``/``sink.read``.
    A sink without a readable store (e.g. InMemoryUpsertSink) cannot
    carry sketch state across triggers, so it is rejected up front at
    pipeline construction rather than failing mid-stream on the first
    non-empty batch.
    """
    from flink_streaming_demo_spark.operators.scale import (
        KMV_K,
        kmv_merge,
        kmv_partial,
    )

    if k is None:
        k = KMV_K
    return _streaming_sketch_maintenance(
        sink,
        group_cols,
        partial_fn=lambda b: kmv_partial(b, group_cols, key_col, k),
        merge_fn=lambda cur, part: kmv_merge(cur, part, group_cols, k),
        state_cols=("kmv",),
        sketch_name="streaming_kmv_distinct",
    )


def _streaming_sketch_maintenance(
    sink,
    group_cols: list[str],
    partial_fn,
    merge_fn,
    state_cols: tuple[str, ...],
    sketch_name: str,
    expected_key: list[str] | None = None,
    epoch_guard: bool = False,
):
    """Shared skeleton of the streaming sketch maintainers (KMV, HLL,
    Bloom, CMS). All four sketches are semigroups whose merge is
    idempotent on replayed input, so ONE maintenance shape serves them
    all: per non-empty micro-batch, build the batch's sketch partial,
    semi-join the store to the batch's group keys (only touched groups
    feed the merge — O(touched) per trigger, the r8 fix), ⊕-merge, and
    upsert. Crash-replay safety falls out of merge idempotence; no dedup
    bookkeeping exists anywhere in the path.

    ``state_cols``: the sketch's state columns in the store beyond
    group_cols. ``expected_key``: when the sketch keeps MULTIPLE state
    rows per group (HLL registers, Bloom words, CMS counters), the
    sink's upsert key must be exactly group_cols + the state's row
    identity — checked at construction, because a mis-keyed sink would
    silently collapse state rows into one.

    ``epoch_guard``: for the one NON-idempotent merge (CMS: counters SUM,
    so re-merging a replayed epoch double-counts), the body records each
    applied epoch id as a marker directory next to the store and skips a
    re-delivered epoch. The marker is written AFTER the upsert, so the
    residual unsafe window is a crash between upsert completion and
    marker creation — strictly narrower than no guard, and the same
    exactness class as any SUM-based streaming aggregate over a
    non-transactional sink (a production deployment would commit state
    and marker atomically via a transactional table format). The
    idempotent sketches skip the guard: their replay safety is
    algebraic, with no window at all."""
    if not (hasattr(sink, "path") and hasattr(sink, "read")):
        raise TypeError(
            f"{sketch_name} needs a store-backed sink exposing "
            ".path and .read(spark) (ParquetUpsertSink); got "
            f"{type(sink).__name__} — its state cannot be merged across "
            "triggers"
        )
    if (
        expected_key is not None
        and getattr(sink, "key_cols", expected_key) != expected_key
    ):
        raise ValueError(
            f"sink key_cols must be {expected_key} (one upsert row per "
            f"sketch state row), got {sink.key_cols}"
        )

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        import os

        marker = os.path.join(f"{sink.path}_epochs", f"epoch={epoch_id}")
        if epoch_guard and os.path.exists(marker):
            return
        if not batch_df.head(1):
            return
        # Lazy checkpoint (r16, guide §2.6 / VERDICT r15 #4): the
        # batch partials still feed both the touched-groups probe and
        # the merge exactly once (checkpoint cache), but materialize
        # inside the sink's own first action instead of as a separate
        # job per micro-batch. Ordering is safe by the crossdoc-gate
        # argument: every read of the store (``cur``) executes inside
        # the sink's pre-write jobs (bucket collect + merge
        # checkpoint), which complete before the dynamic overwrite
        # rewrites the parquet they read.
        part = partial_fn(batch_df).localCheckpoint(eager=False)
        if os.path.exists(sink.path):
            from pyspark.sql import functions as F

            touched = part.select(*group_cols).distinct()
            cur = (
                sink.read(batch_df.sparkSession)
                .join(F.broadcast(touched), group_cols, "left_semi")
                .select(*group_cols, *state_cols)
            )
            part = merge_fn(cur, part)
        sink.foreach_batch(part, epoch_id)
        if epoch_guard:
            os.makedirs(marker, exist_ok=True)

    return body


def streaming_hll_distinct(
    sink,
    group_cols: list[str],
    key_col: str,
):
    """foreachBatch body maintaining a deterministic-HLL register table
    over a stream — the register-sketch sibling of streaming_kmv_distinct:
    per micro-batch, build the batch's registers
    (operators/scale.hll_partial), ⊕-merge with the store's current
    per-group registers (union + per-(group, bucket) MAX), and upsert the
    merged rows under key (group_cols..., bucket). MAX is idempotent, so
    a crash-replayed micro-batch re-merges to the identical register
    table — effective exactly-once from the sketch algebra alone — and
    last-write-wins upsert is correct because merged rho >= stored rho
    by construction.

    Scale shape mirrors the KMV body: the batch's registers are
    trigger-bounded (<= m rows per touched group), the store side is
    SEMI-JOINED to the batch's group keys before merging (only touched
    groups feed the merge), and the sink's dynamic-partition overwrite
    rewrites only touched buckets. State per group is <= m = 256
    (bucket, rho) smallint pairs regardless of stream length; estimates
    come from the read-time view operators/scale.hll_estimate over
    ``sink.read(spark)`` — the store IS the mergeable sketch, so batch
    partials (hll_rollup) and the streaming store compose freely.

    Requires a STORE-BACKED sink (ParquetUpsertSink) whose key is
    exactly (group_cols..., bucket); both are checked at construction so
    a mis-keyed sink fails fast instead of silently collapsing registers
    (key without bucket) or duplicating them (extra key columns).
    """
    from flink_streaming_demo_spark.operators.scale import (
        hll_merge,
        hll_partial,
    )

    return _streaming_sketch_maintenance(
        sink,
        group_cols,
        partial_fn=lambda b: hll_partial(b, group_cols, key_col),
        merge_fn=lambda cur, part: hll_merge(cur, part, group_cols),
        state_cols=("bucket", "rho"),
        sketch_name="streaming_hll_distinct",
        expected_key=[*group_cols, "bucket"],
    )


def streaming_bloom_membership(
    sink,
    group_cols: list[str],
    key_col: str,
):
    """foreachBatch body maintaining a Bloom word table over a stream —
    membership blocklists/benchmark sets that GROW as data streams in
    (new canaries, new banned keys). Per micro-batch: OR the batch's
    probe bits into the store under key (group_cols..., word); bit_or
    idempotence gives crash-replay safety, and last-write-wins upsert is
    correct because merged bits ⊇ stored bits. Probes against the live
    store via operators/scale.bloom_maybe_contains keep the one-sided
    no-false-negatives contract at every trigger boundary."""
    from flink_streaming_demo_spark.operators.scale import (
        bloom_merge,
        bloom_partial,
    )

    return _streaming_sketch_maintenance(
        sink,
        group_cols,
        partial_fn=lambda b: bloom_partial(b, group_cols, key_col),
        merge_fn=lambda cur, part: bloom_merge(cur, part, group_cols),
        state_cols=("word", "bits"),
        sketch_name="streaming_bloom_membership",
        expected_key=[*group_cols, "word"],
    )


def streaming_cms_counts(
    sink,
    group_cols: list[str],
    key_col: str,
):
    """foreachBatch body maintaining a Count-Min counter grid over a
    stream — running per-key frequency estimates (heavy hitters,
    throttle thresholds) with state bounded at depth*width longs per
    group regardless of stream length or key cardinality. Counters merge
    by SUM, which is NOT idempotent, so this maintainer runs with the
    epoch guard: a re-delivered epoch id is skipped instead of re-merged
    (see _streaming_sketch_maintenance for the exactness class and the
    residual window). Tests pin sequential-chunk convergence to the
    batch grid AND that a same-epoch replay leaves the store unchanged
    while a new epoch with the same rows double-counts (proving the
    guard keys on the epoch, not the data)."""
    from flink_streaming_demo_spark.operators.scale import (
        cms_merge,
        cms_partial,
    )

    return _streaming_sketch_maintenance(
        sink,
        group_cols,
        partial_fn=lambda b: cms_partial(b, group_cols, key_col),
        merge_fn=lambda cur, part: cms_merge(cur, part, group_cols),
        state_cols=("row", "col", "cnt"),
        sketch_name="streaming_cms_counts",
        expected_key=[*group_cols, "row", "col"],
        epoch_guard=True,
    )


def streaming_hist_counts(
    sink,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int | None = None,
):
    """foreachBatch body maintaining a fixed-boundary histogram over a
    stream — running per-group quantiles (read via
    operators/scale.hist_quantiles over ``sink.read(spark)``) with state
    bounded at n_bins longs per group. Bin counts merge by SUM, so like
    the CMS maintainer it runs with the epoch guard (a re-delivered
    epoch id is skipped); bins are declared up front, which is what
    makes the sketch engine-deterministic where adaptive quantile
    sketches (t-digest/KLL) are merge-order-sensitive."""
    from flink_streaming_demo_spark.operators.scale import (
        HIST_N_BINS,
        hist_merge,
        hist_partial,
    )

    bins = HIST_N_BINS if n_bins is None else n_bins
    return _streaming_sketch_maintenance(
        sink,
        group_cols,
        partial_fn=lambda b: hist_partial(
            b, group_cols, value_col, lo, hi, bins
        ),
        merge_fn=lambda cur, part: hist_merge(cur, part, group_cols),
        state_cols=("bin", "cnt"),
        sketch_name="streaming_hist_counts",
        expected_key=[*group_cols, "bin"],
        epoch_guard=True,
    )


def rolling_kmv_view(
    store: DataFrame,
    day_col: str = "day",
    window_days: int = 7,
    k: int | None = None,
) -> DataFrame:
    """Rolling N-day distinct view over a PER-DAY KMV sketch store —
    the streaming consumer's form of the batch
    events_kmv_rolling_distinct (r10 verdict #7): maintain the store
    with ``streaming_kmv_distinct(sink, [day_col], key)`` so each day's
    rows collapse into one ≤k-doubles sketch as they stream in, then
    THIS read-time view fans each day's partial out to the ≤N
    window-ends it falls in, ⊕-merges per window-end, and estimates.
    Because KMV merge is associative and the per-day maintainer
    converges to the batch per-day partial (pinned by the maintainer
    test), the view over the store EQUALS the batch rolling query over
    the same rows — pinned by
    tests/test_streaming.py::test_rolling_kmv_view_equals_batch_query.

    Emits (win_day, n_sampled, kmv_distinct), one row per OBSERVED day
    (window-ends with no own-day data are not served, matching batch).
    Read cost is sketch-sized: ≤ N·k doubles per window-end, never the
    base data."""
    from flink_streaming_demo_spark.operators.scale import (
        KMV_K,
        kmv_estimate,
        kmv_rollup,
    )

    if k is None:
        k = KMV_K
    fan = store.select(
        F.explode(
            F.expr(
                f"sequence({day_col}, {day_col} + interval "
                f"{window_days - 1} days, interval 1 day)"
            )
        ).alias("win_day"),
        "kmv",
    )
    rolled = kmv_rollup(fan, ["win_day"], k)
    observed = store.select(F.col(day_col).alias("win_day")).distinct()
    return kmv_estimate(rolled.join(observed, "win_day"), k).select(
        "win_day", "n_sampled", "kmv_distinct"
    )


def rolling_hll_view(
    store: DataFrame,
    day_col: str = "day",
    window_days: int = 7,
) -> DataFrame:
    """Rolling N-day distinct view over a PER-DAY HLL register store —
    register-sketch sibling of rolling_kmv_view, streaming form of the
    batch events_hll_rolling_users: maintain the store with
    ``streaming_hll_distinct(sink, [day_col], key)`` (sink key
    [day_col, 'bucket']), then fan each day's registers to its ≤N
    window-ends and merge by per-bucket MAX — idempotent, so window
    overlap is free and the view equals the batch rolling query over
    the same rows (streaming≡batch test). Emits
    (win_day, n_registers, hll_distinct) per observed day; read cost is
    ≤ N·256 register rows per window-end."""
    from flink_streaming_demo_spark.operators.scale import (
        hll_estimate,
        hll_rollup,
    )

    fan = store.select(
        F.explode(
            F.expr(
                f"sequence({day_col}, {day_col} + interval "
                f"{window_days - 1} days, interval 1 day)"
            )
        ).alias("win_day"),
        "bucket",
        "rho",
    )
    rolled = hll_rollup(fan, ["win_day"])
    observed = store.select(F.col(day_col).alias("win_day")).distinct()
    return hll_estimate(rolled.join(observed, "win_day"), ["win_day"])


def rolling_hist_view(
    store: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    day_col: str = "day",
    window_days: int = 7,
    n_bins: int | None = None,
) -> DataFrame:
    """Rolling N-day quantile view over a PER-DAY histogram-bin store —
    streaming form of the batch events_hist_rolling_quantiles: maintain
    the store with ``streaming_hist_counts(sink, [day_col], value, lo,
    hi)`` (sink key [day_col, 'bin']), then fan each day's bins to its
    ≤N window-ends, SUM-merge per window-end, and interpolate the
    quantiles at read time. Bin SUM is associative, so the view equals
    the batch rolling query over the same rows (streaming≡batch test).
    Emits (win_day, q, hist_quantile, n) per observed day; read cost is
    ≤ N·n_bins longs per window-end."""
    from flink_streaming_demo_spark.operators.scale import (
        HIST_N_BINS,
        hist_quantiles,
        hist_rollup,
    )

    bins = HIST_N_BINS if n_bins is None else n_bins
    fan = store.select(
        F.explode(
            F.expr(
                f"sequence({day_col}, {day_col} + interval "
                f"{window_days - 1} days, interval 1 day)"
            )
        ).alias("win_day"),
        "bin",
        "cnt",
    )
    rolled = hist_rollup(fan, ["win_day"])
    observed = store.select(F.col(day_col).alias("win_day")).distinct()
    return hist_quantiles(
        rolled.join(observed, "win_day"), ["win_day"], qs, lo, hi, bins
    )


def rolling_cms_view(
    store: DataFrame,
    probes: DataFrame,
    key_col: str,
    day_col: str = "day",
    window_days: int = 7,
) -> DataFrame:
    """Rolling N-day frequency view over a PER-DAY CMS counter store —
    streaming form of the batch events_cms_rolling_counts: maintain the
    store with ``streaming_cms_counts(sink, [day_col], key)`` (sink key
    [day_col, 'row', 'col'], epoch-guarded SUM merge), then fan each
    day's grid to its ≤N window-ends, SUM-merge per window-end, and
    point-query ``probes`` (a (win_day, key_col) frame — NULL keys are
    the caller's concern, matching the batch query's filtered probe
    construction). Counter SUM is associative, so the view equals the
    batch rolling query over the same rows (streaming≡batch test).
    Emits (win_day, key_col, cms_count)."""
    from flink_streaming_demo_spark.operators.scale import (
        cms_estimate,
        cms_rollup,
    )

    fan = store.select(
        F.explode(
            F.expr(
                f"sequence({day_col}, {day_col} + interval "
                f"{window_days - 1} days, interval 1 day)"
            )
        ).alias("win_day"),
        "row",
        "col",
        "cnt",
    )
    rolled = cms_rollup(fan, ["win_day"])
    return cms_estimate(rolled, probes, ["win_day"], key_col)


def streaming_reservoir_weighted(
    sink,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int = None,
):
    """foreachBatch body maintaining a weighted reservoir sample
    (Efraimidis–Spirakis A-ES, operators/sampling.reservoir_partial)
    over a stream: per micro-batch, race-key the batch rows, keep the k
    smallest per group, ⊕-merge with the store's reservoir. The race
    key is deterministic in the row id, so the merge is IDEMPOTENT on
    replayed batches — crash-replay lands on identical state with no
    dedup bookkeeping, the same algebraic exactly-once as the KMV
    maintainer. State per group is <= k structs forever; the sample
    remains exactly weight-proportional over the whole history because
    keep-the-smallest over merges equals one global top-k."""
    from flink_streaming_demo_spark.operators.sampling import (
        RESERVOIR_K,
        reservoir_merge,
        reservoir_partial,
    )

    if k is None:
        k = RESERVOIR_K
    return _streaming_sketch_maintenance(
        sink,
        group_cols,
        partial_fn=lambda b: reservoir_partial(
            b, group_cols, id_col, weight_col, k
        ),
        merge_fn=lambda cur, part: reservoir_merge(
            cur, part, group_cols, k
        ),
        state_cols=("res",),
        sketch_name="streaming_reservoir_weighted",
    )


def streaming_lateness_monitor(sink, late_dir: str | None = None):
    """foreachBatch body maintaining the watermark-lateness profile
    (operators/lateness) incrementally over an out-of-order replay: per
    micro-batch, measure every event against the watermark carried over
    from PRIOR batches (max event time seen before this batch — exactly
    the per-epoch discretization of the batch query, with epoch =
    micro-batch), fold the batch's exact-integer profile into the
    per-type store by ⊕-merge (SUM/SUM/MAX/SUM/SUM), then advance the
    stored watermark. When the replay chunks equal the batch query's
    epochs, streaming store == batch profile EXACTLY (integer algebra,
    no floats) — the equivalence the test pins.

    ``late_dir``: optional LATE-DATA SIDE OUTPUT (the Flink
    side-output / dead-letter analogue): each batch's late rows (full
    payload + their measured late_s) append to an epoch-partitioned
    parquet channel for reprocessing/backfill instead of being only
    counted. Appends land under epoch=<id> directories, so a replayed
    epoch overwrites its own partition — no duplicate late rows.

    Replay safety: the profile merge is SUM-based (non-idempotent), so
    the body carries the same epoch-marker guard as the CMS maintainer
    — a re-delivered epoch id is skipped; the marker lands after the
    watermark write, and a production deployment would commit profile,
    watermark, and marker in one transactional table commit. The
    watermark itself lives in a 1-row parquet next to the store
    (``<path>_wm``): reading it is O(1), writing it rewrites one tiny
    file per trigger."""
    import os

    from flink_streaming_demo_spark.operators import lateness as L

    if not (hasattr(sink, "path") and hasattr(sink, "read")):
        raise TypeError(
            "streaming_lateness_monitor needs a store-backed sink "
            "exposing .path and .read(spark) (ParquetUpsertSink); got "
            f"{type(sink).__name__} — its watermark cannot be carried "
            "across triggers"
        )

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        marker = os.path.join(f"{sink.path}_epochs", f"epoch={epoch_id}")
        if os.path.exists(marker):
            return
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        wm_path = f"{sink.path}_wm"
        wm_us = None
        if os.path.exists(wm_path):
            wm_us = spark.read.parquet(wm_path).agg(
                F.max("wm_us")
            ).first()[0]
        ev = batch_df.withColumn("ets_us", F.unix_micros("ts"))
        # Lazy checkpoints (r16, guide §2.6 / VERDICT r15 #4): ``late``
        # feeds the side output and the profile exactly once via the
        # checkpoint cache; the profile partials materialize inside the
        # sink's own pre-write jobs. Store-read-before-write ordering
        # is the crossdoc-gate argument: ``cur`` executes inside the
        # sink's bucket collect + merge checkpoint, both before the
        # overwrite (and the prior watermark was already fetched into
        # ``wm_us`` as a Python scalar above).
        late = L.lateness_vs_fixed_watermark(ev, wm_us).localCheckpoint(
            eager=False
        )
        if late_dir is not None:
            late.filter(F.col("is_late")).drop("is_late").write.mode(
                "overwrite"
            ).parquet(os.path.join(late_dir, f"epoch={epoch_id}"))
        part = L.lateness_profile_ints(late).localCheckpoint(eager=False)
        if os.path.exists(sink.path):
            touched = part.select("event_type").distinct()
            cur = (
                sink.read(spark)
                .join(F.broadcast(touched), ["event_type"], "left_semi")
                .select(
                    "event_type",
                    "n_events",
                    "n_late",
                    "max_late_s",
                    "sum_late_s",
                    "n_dropped_60s",
                )
            )
            part = L.merge_profiles(cur, part)
        sink.foreach_batch(part, epoch_id)
        batch_max = ev.agg(F.max("ets_us")).first()[0]
        # A non-empty batch whose ts values are ALL NULL yields
        # batch_max=None; with no prior watermark either, max() over an
        # empty generator would raise and kill the query (r10 ADVICE
        # item 2). Keep the prior watermark (possibly still unset) and
        # only advance on real timestamps.
        candidates = [v for v in (wm_us, batch_max) if v is not None]
        if candidates:
            spark.createDataFrame(
                [(int(max(candidates)),)], "wm_us bigint"
            ).coalesce(1).write.mode("overwrite").parquet(wm_path)
        os.makedirs(marker, exist_ok=True)

    return body


def streaming_contract_counts(
    events: DataFrame,
    checks: list[tuple[str, "F.Column"]],
) -> DataFrame:
    """Streaming data-contract monitor: running
    (check_name, n_checked, n_violations, passed) counters over the
    stream — the incremental form of plans/tpch_more's
    system_data_expectations scan checks, for gating a live ingest
    instead of a finished batch. ``checks`` is [(name, violation
    condition)]; each event contributes one (checked, violated) pair
    per check via a map-side array explode, and ONE update-mode
    aggregation keeps the totals.

    Scale/state shape: state is exactly len(checks) rows — constant,
    independent of stream volume and of time (no watermark needed:
    counters never expire) — and the per-batch work is a map-only
    expression plus a partial agg that collapses each micro-batch to
    len(checks) rows before the shuffle. Referential checks are NOT
    expressible this way (they need the dimension side); gate those at
    the sink with streaming_enrich_with_static + an is-null counter
    check, or in the periodic batch pass."""
    arr = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                cond.cast("long").alias("viol"),
            )
            for name, cond in checks
        ]
    )
    flat = events.select(F.explode(arr).alias("c")).select("c.*")
    return (
        flat.groupBy("check_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            F.sum("viol").cast("bigint").alias("n_violations"),
        )
        .withColumn("passed", F.col("n_violations") == 0)
    )


def streaming_contract_maintainer(sink, checks):
    """Store-backed form of ``streaming_contract_counts``: the contract
    counters persist in a keyed parquet store and survive restarts —
    the shape a long-lived ingest gate actually runs (the update-mode
    form's counters die with the query). Counter merge is SUM (NOT
    idempotent), so this rides the CMS slot of the shared maintenance
    skeleton: per-epoch marker guard, store semi-joined to touched
    check names, ⊕ = per-check SUM. Read ``passed`` from the store at
    query time: n_violations == 0."""
    group_cols = ["check_name"]

    def partial(batch_df: DataFrame) -> DataFrame:
        return streaming_contract_counts(batch_df, checks).drop("passed")

    def merge(cur: DataFrame, part: DataFrame) -> DataFrame:
        return (
            cur.unionByName(part)
            .groupBy("check_name")
            .agg(
                F.sum("n_checked").cast("bigint").alias("n_checked"),
                F.sum("n_violations")
                .cast("bigint")
                .alias("n_violations"),
            )
        )

    return _streaming_sketch_maintenance(
        sink,
        group_cols,
        partial_fn=partial,
        merge_fn=merge,
        state_cols=("n_checked", "n_violations"),
        sketch_name="streaming_contract_maintainer",
        expected_key=["check_name"],
        epoch_guard=True,
    )


# --- Incremental BM25 index (hybrid-retrieval streaming symmetry) -----------

def _overlap_merges(first, second, epoch_id: int) -> None:
    """Run two keyed-store merges concurrently (guide §2.6: overlap
    independent jobs so one merge's straggler tail back-fills with the
    other's tasks). Each argument is (sink, frame); the two sinks MUST
    target disjoint stores and the frames must not read either store —
    callers guarantee both (batch-derived, checkpointed inputs).
    InheritableThread propagates the driving thread's job group to the
    JVM; the second merge's failure is re-raised after both finish."""
    from pyspark import InheritableThread

    err: list[BaseException] = []
    sink2, frame2 = second

    def _second() -> None:
        try:
            sink2.foreach_batch(frame2, epoch_id)
        except BaseException as exc:  # propagate to the driving thread
            err.append(exc)

    t = InheritableThread(target=_second)
    t.start()
    try:
        first[0].foreach_batch(first[1], epoch_id)
    finally:
        t.join()
    if err:
        raise err[0]


def streaming_bm25_index(postings_sink, lengths_sink):
    """foreachBatch body maintaining an incremental BM25 inverted index
    over an append-only document stream: two keyed upsert stores,
    postings (term, doc_id) -> (tf, dl) and lengths (doc_id) -> dl.

    Unlike the sketch maintainers there is NO read-merge step and NO
    epoch guard: documents are immutable and append-only, so a (term,
    doc_id) posting's value never changes — a crash-replayed micro-batch
    re-upserts byte-identical rows and the store converges regardless
    (the same algebraic replay-safety class as the idempotent sketches,
    for the simpler reason that the "merge" is last-write-wins over
    identical writes). A corpus with document REVISIONS would need an
    order_col'd sink and a stale-postings sweep; out of contract here.

    Scale: the indexing pass is operators/retrieval.bm25_postings —
    linear in batch tokens, map-side combined, shuffled on (doc, term).
    Store upserts touch only the buckets the batch's keys hash into.
    At real scale the postings store would be sharded BY TERM so a
    query's read prunes to its terms' shards (the classic inverted-index
    layout); ParquetUpsertSink buckets on the full key, so the read view
    below relies on the term filter pushing into the parquet scan
    instead — still row-pruned, not partition-pruned.
    """
    from flink_streaming_demo_spark.operators import retrieval as RETR

    for sink, want_key, name in (
        (postings_sink, ["term", "doc_id"], "postings_sink"),
        (lengths_sink, ["doc_id"], "lengths_sink"),
    ):
        if not (hasattr(sink, "path") and hasattr(sink, "read")):
            raise TypeError(
                f"streaming_bm25_index needs store-backed sinks; "
                f"{name} is {type(sink).__name__}"
            )
        if getattr(sink, "key_cols", want_key) != want_key:
            raise ValueError(
                f"{name} key_cols must be {want_key} (one row per "
                f"posting / per doc), got {sink.key_cols}"
            )

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.head(1):
            return
        # Lazy checkpoint + overlapped merges (r16, guide §2.6 /
        # VERDICT r15 #4): one tokenization pass still feeds both
        # stores (checkpoint cache; concurrent first access is safe —
        # block-manager puts are per-partition idempotent), but it
        # materializes inside the sinks' own jobs instead of as a
        # separate job per micro-batch, and the two merges touch
        # disjoint stores so they run concurrently.
        post = RETR.bm25_postings(batch_df).localCheckpoint(eager=False)
        _overlap_merges(
            (postings_sink, post),
            (lengths_sink, post.select("doc_id", "dl").distinct()),
            epoch_id,
        )

    return body


def bm25_topk_view(
    spark,
    postings_sink,
    lengths_sink,
    query_terms,
    k: int = 10,
    exclude_id: int | None = None,
):
    """Read-time BM25 top-k over the incremental index stores. Builds
    the same (tf, stats) frames the batch ``bm25_topk`` derives from the
    raw corpus — term-filtered postings (filter pushed into the store
    scan) and a 1-row stats aggregate over the lengths store — and runs
    the SHARED scoring tail ``bm25_rank``, so the view's floats equal
    the batch query's bit-for-bit once the stores have absorbed the same
    documents (the streaming≡batch test pins this row-for-row)."""
    from flink_streaming_demo_spark.operators import retrieval as RETR

    terms = list(query_terms)
    stats = lengths_sink.read(spark).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    tf = (
        postings_sink.read(spark)
        .filter(F.col("term").isin(*terms))
        .select("doc_id", "dl", "term", "tf")
    )
    return RETR.bm25_rank(tf, stats, terms, k=k, exclude_id=exclude_id)


def bm25_batch_view(
    spark,
    postings_sink,
    lengths_sink,
    query_bags,
    k: int = 10,
):
    """Read-time BATCHED BM25 top-k over the incremental index stores:
    union-term-filtered postings (filter pushed into the store scan) + a
    1-row stats aggregate over the lengths store, scored and per-query
    ranked through the SAME bm25_batch_rank tail as the batch
    ``bm25_batch_topk`` — view ≡ batch bit-for-bit once the stores have
    absorbed the same documents (streaming≡batch test). This is the
    serving shape of an eval/distillation pipeline against a live
    index: one store read amortized across the whole query batch."""
    from flink_streaming_demo_spark.operators import retrieval as RETR

    _, union_terms = RETR.check_query_bags(query_bags)
    stats = lengths_sink.read(spark).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    tf = (
        postings_sink.read(spark)
        .filter(F.col("term").isin(*union_terms))
        .select("doc_id", "dl", "term", "tf")
    )
    return RETR.bm25_batch_rank(tf, stats, query_bags, k=k)


def streaming_bm25_chunk_index(postings_sink, lengths_sink):
    """foreachBatch body maintaining the CHUNK-level incremental BM25
    index (the RAG serving index): postings (term, doc_id, chunk_idx)
    -> (tf, dl) and chunk lengths (doc_id, chunk_idx) -> dl, on the
    shared chunk grid (functions/text.chunk_windows_expr). Same
    replay-safety argument as streaming_bm25_index: documents are
    immutable and append-only, so chunk postings re-upsert
    byte-identically on crash replay — no epoch guard needed."""
    from flink_streaming_demo_spark.operators import retrieval as RETR

    for sink, want_key, name in (
        (postings_sink, ["term", "doc_id", "chunk_idx"], "postings_sink"),
        (lengths_sink, ["doc_id", "chunk_idx"], "lengths_sink"),
    ):
        if not (hasattr(sink, "path") and hasattr(sink, "read")):
            raise TypeError(
                f"streaming_bm25_chunk_index needs store-backed sinks; "
                f"{name} is {type(sink).__name__}"
            )
        if getattr(sink, "key_cols", want_key) != want_key:
            raise ValueError(
                f"{name} key_cols must be {want_key} (one row per "
                f"chunk posting / per chunk), got {sink.key_cols}"
            )

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.head(1):
            return
        # Same shape as streaming_bm25_index: lazy one-pass extraction,
        # disjoint-store merges overlapped (r16, guide §2.6).
        post = RETR.bm25_chunk_postings(batch_df).localCheckpoint(
            eager=False
        )
        _overlap_merges(
            (postings_sink, post),
            (lengths_sink,
             post.select("doc_id", "chunk_idx", "dl").distinct()),
            epoch_id,
        )

    return body


def bm25_maxp_view(
    spark,
    postings_sink,
    lengths_sink,
    query_terms,
    k: int = 10,
):
    """Read-time BM25-MaxP top-k over the incremental chunk index:
    term-filtered chunk postings (filter pushed into the store scan) +
    a 1-row stats aggregate over the chunk-lengths store, scored and
    MaxP-aggregated through the SAME bm25_maxp_rank tail as the batch
    sim_bm25_maxp — view ≡ batch bit-for-bit once the stores have
    absorbed the same documents (streaming≡batch test)."""
    from flink_streaming_demo_spark.operators import retrieval as RETR

    terms = list(query_terms)
    stats = lengths_sink.read(spark).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    tf = (
        postings_sink.read(spark)
        .filter(F.col("term").isin(*terms))
        .select("doc_id", "chunk_idx", "dl", "term", "tf")
    )
    return RETR.bm25_maxp_rank(tf, stats, terms, k=k)


# --- Incremental IVF index (dense-retrieval streaming symmetry) --------------

def _check_ivf_cells_sink(cells_sink) -> None:
    """Wiring-time validation of an IVF cell store sink, shared by the
    index maintainer and the dedup gate (r16): the gate used to call
    ``streaming_ivf_index`` just for these checks and discard the
    returned body — which also discarded the body's EAGER centroid
    checkpoint, a thrown-away materialization job per gate wiring."""
    if not (hasattr(cells_sink, "path") and hasattr(cells_sink, "read")):
        raise TypeError(
            "streaming_ivf_index needs a store-backed sink; cells_sink "
            f"is {type(cells_sink).__name__}"
        )
    # getattr default of None (not the expected value): a sink MISSING
    # the attribute must fail the wiring check, not pass it by default
    if getattr(cells_sink, "key_cols", None) != ["vec_id"]:
        raise ValueError(
            "cells_sink key_cols must be ['vec_id'] (one row per "
            f"vector), got {getattr(cells_sink, 'key_cols', None)}"
        )


def streaming_ivf_index(cells_sink, centroids):
    """foreachBatch body maintaining an incremental IVF index over an
    append-only embedding stream: one keyed upsert store, (vec_id) ->
    (centroid_id, embedding, nrm), assignments computed by the SAME
    ``operators/similarity.assign_to_centroids`` the batch ``ivf_topk``
    uses — the dense-side twin of ``streaming_bm25_index`` (r12 verdict
    #4), completing the RAG-serving symmetry the lexical tier started
    (reference analogue: the K2 upsert-store pattern,
    ``ElasticsearchUpsertSink.scala:42-83``).

    Replay safety (no epoch guard, like the BM25 indexer): vectors are
    immutable and append-only and ``centroids`` is FIXED for the life of
    the store, so a vector's (centroid_id, nrm) is a pure function of
    its embedding — a crash-replayed micro-batch re-upserts
    byte-identical rows and the store converges. Retraining centroids
    invalidates every stored assignment; that is a REINDEX (new store
    path), not an upsert — same contract as a production IVF serving
    index, stamped here so nobody "refreshes" centroids in place.

    Scale: assignment is a broadcast(K centroids) map-side scan of the
    batch plus one per-vector rank exchange; store upserts touch only
    the buckets the batch's vec_ids hash into. At real scale the store
    would be PARTITIONED by centroid_id so a query's probes prune whole
    partitions; ParquetUpsertSink buckets on the key (vec_id), so the
    read view below relies on the centroid_id filter pushing into the
    parquet scan instead — row-group-pruned, not partition-pruned.
    """
    from flink_streaming_demo_spark.operators import similarity as SIM

    _check_ivf_cells_sink(cells_sink)
    cent = centroids.select("centroid_id", "embedding").localCheckpoint()

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.head(1):
            return
        assigned = SIM.assign_to_centroids(batch_df, cent, 1).select(
            "vec_id", "centroid_id", "embedding", "nrm"
        )
        cells_sink.foreach_batch(assigned, epoch_id)

    return body


def ivf_topk_view(
    spark,
    cells_sink,
    queries: DataFrame,
    centroids,
    k: int = 5,
    nprobe: int = 2,
):
    """Read-time IVF top-k over the incremental cell store. Assigns the
    query vectors to their ``nprobe`` nearest centroids (same
    ``assign_to_centroids``), prunes the store read to the probed cells,
    and ranks through the SHARED ``operators/similarity.ivf_rank`` tail
    — so the view's floats equal the batch ``ivf_topk``'s bit-for-bit
    once the store has absorbed the same vectors (the streaming≡batch
    test pins this row-for-row).

    The probed-cell list is a bounded driver fetch (<= min(K,
    n_queries x nprobe) rows — the broadcast-semi-join pattern, not a
    data-sized collect) turned into an ``isin`` predicate that pushes
    into the store's parquet scan: a 1000-cell store serving a 2-probe
    query reads ~2/1000 of its rows, which is the whole point of IVF
    serving.

    Degenerate serving states return an empty, correctly-typed frame
    instead of raising: an EMPTY query set (empty probed-cell list — a
    bare isin() raises) and a NEVER-WRITTEN store (a read arriving
    before the first non-empty micro-batch; the maintainer skips empty
    batches, so the path may not exist yet)."""
    import os

    from flink_streaming_demo_spark.operators import similarity as SIM

    # Lazy checkpoint (r16, VERDICT r15 #4): the probed-cell collect
    # below is the view's first action and materializes the assignment
    # there; the ranked read then reuses the cache — one assignment
    # pass either way, one fewer job per view build.
    qry = SIM.assign_to_centroids(queries, centroids, nprobe).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("nrm").alias("q_norm"),
        "centroid_id",
    ).localCheckpoint(eager=False)
    if not os.path.exists(cells_sink.path):
        # typed-empty corpus derived from the query frame's own dtypes
        corp = qry.select(
            F.col("query_id").alias("neighbor_id"),
            F.col("q_vec").alias("c_vec"),
            F.col("q_norm").alias("c_norm"),
            "centroid_id",
        ).filter(F.lit(False))
        return SIM.ivf_rank(qry, corp, k)
    cells = sorted(
        r[0] for r in qry.select("centroid_id").distinct().collect()
    )
    # empty query set -> empty probed-cell list; isin() with no
    # operands raises, so pin the degenerate filter to false (the view
    # returns an empty, correctly-typed frame)
    probe_pred = (
        F.col("centroid_id").isin(cells) if cells else F.lit(False)
    )
    corp = (
        cells_sink.read(spark)
        .filter(probe_pred)
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_vec"),
            F.col("nrm").alias("c_norm"),
            "centroid_id",
        )
    )
    return SIM.ivf_rank(qry, corp, k)


def streaming_ivf_dedup_gate(
    cells_sink,
    decisions_sink,
    centroids,
    threshold: float,
):
    """Gate-then-ingest foreachBatch body: each micro-batch of
    (vec_id, embedding) rows is first VERDICTED against the admitted
    store (``operators/similarity.cell_neardup_gate`` — near-dup iff an
    already-admitted nearest-cell mate has cosine >= threshold), the
    decisions written to ``decisions_sink``, and only then is the batch
    upserted into the cell store (the ``streaming_ivf_index`` merge) —
    the ingest-time dense dedup front of a training-data pipeline, the
    embedding twin of ``streaming_incremental_dedup``.

    Ordering matters and is forced: the decisions write fully
    materializes the gate BEFORE the store merge rewrites the parquet
    the gate read from.

    Replay semantics (documented, weaker than the index maintainers'):
    the STORE converges under crash replay exactly like
    streaming_ivf_index (assignments are pure functions of the vector).
    DECISIONS are at-least-once: re-gating an already-ingested batch
    sees its own batch-mates in the store (self-pairs ARE excluded), so
    a replayed verdict can flip 'new' -> 'near_dup' — monotone toward
    more dedup, never the reverse — and an existing near_dup row's
    (dup_of, cos_sim) can be RE-POINTED at a batch-mate the store now
    holds with higher cosine (the verdict itself never weakens; the
    attribution may move). Both are the standard at-least-once behavior
    of any gate-then-ingest pipeline without a transactional store.
    Exactly-once decisions would need the sink's epoch guard + a
    store-side epoch column; out of contract here.
    """
    import os

    from flink_streaming_demo_spark.operators import similarity as SIM

    # cells_sink must be a store-backed read/upsert sink (the gate READS
    # it); streaming_ivf_index validates that plus the key. The
    # decisions sink only needs keyed upsert writes — an in-memory sink
    # is fine for tests — but the check is a hard AND like the sibling
    # maintainers', not a vacuous OR: a sink missing foreach_batch must
    # fail at WIRING time, not mid-stream on the first non-empty batch.
    if not hasattr(decisions_sink, "foreach_batch"):
        raise TypeError(
            "streaming_ivf_dedup_gate needs a keyed upsert decisions "
            f"sink; decisions_sink is {type(decisions_sink).__name__}"
        )
    if getattr(decisions_sink, "key_cols", None) != ["vec_id"]:
        raise ValueError(
            "decisions_sink key_cols must be ['vec_id'] (one verdict "
            f"per vector), got {getattr(decisions_sink, 'key_cols', None)}"
        )
    # wiring-time validation of cells_sink (path + read + key) only —
    # the gate body below upserts the already-computed assignment
    # instead of re-assigning, so no index body (and no discarded
    # eager centroid checkpoint) is built here (r16).
    _check_ivf_cells_sink(cells_sink)
    cent = centroids.select("centroid_id", "embedding").localCheckpoint()

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        store = (
            cells_sink.read(spark)
            if os.path.exists(cells_sink.path)
            else None
        )
        # assign ONCE: the same frame feeds the gate's candidate join
        # and the store upsert (localCheckpoint so neither consumer
        # re-runs the broadcast-K scan + rank exchange)
        assigned = SIM.assign_to_centroids(batch_df, cent, 1).select(
            "vec_id", "centroid_id", "embedding", "nrm"
        ).localCheckpoint(eager=False)
        decisions = SIM.cell_neardup_gate(
            batch_df, store, cent, threshold, assigned=assigned
        )
        # decisions must be materialized BEFORE the store merge mutates
        # the parquet they are derived from; the lazy checkpoint keeps
        # that ordering (it materializes inside the decisions-store
        # write, which runs before the cells merge) without the eager
        # form's separate materialization job per batch (r15).
        decisions_sink.foreach_batch(
            decisions.localCheckpoint(eager=False), epoch_id
        )
        cells_sink.foreach_batch(assigned, epoch_id)

    return body


def reindex_ivf_store(spark, old_sink, new_sink, new_centroids, epoch_id=0):
    """Centroid retrain = REINDEX, operationalized: read the admitted
    vectors out of the OLD cell store, re-assign them against the NEW
    centroids (one bulk ``streaming_ivf_index`` merge into a NEW store
    path), and return the new sink. The old store stays valid for
    serving until the caller switches readers over — the blue/green
    shape a production IVF serving index uses, and the documented
    answer to ``streaming_ivf_index``'s fixed-centroids contract
    (refreshing centroids in place would silently mix assignment
    epochs).

    Scale: one scan of the old store (vectors only; the stale
    centroid_id/nrm columns are recomputed, not trusted) through the
    broadcast-K assignment — the same cost as the original ingest,
    amortizable by running it as a background batch job while the old
    index keeps serving."""
    import os

    # realpath: trailing-slash or symlink aliases of the same store must
    # not slip past the blue/green guard
    if os.path.realpath(old_sink.path) == os.path.realpath(new_sink.path):
        raise ValueError(
            "reindex requires a NEW store path (blue/green); in-place "
            "centroid refresh would mix assignment epochs"
        )
    if os.path.exists(new_sink.path):
        # a pre-populated target would silently mix assignment epochs —
        # exactly the failure the blue/green contract exists to prevent
        raise ValueError(
            f"new store path {new_sink.path!r} already exists; blue/"
            "green reindex writes a FRESH store (delete or pick a new "
            "path)"
        )
    vectors = old_sink.read(spark).select("vec_id", "embedding")
    streaming_ivf_index(new_sink, new_centroids)(vectors, epoch_id)
    return new_sink


# --- Streaming cross-doc exact-substring ingest gate (lexical twin) ----------

def streaming_crossdoc_dedup_gate(
    docs_sink,
    fps_sink,
    decisions_sink,
    min_span: int | None = None,
    max_fp_df: int | None = None,
    max_gram_df: int | None = None,
):
    """Gate-then-ingest foreachBatch body for cross-document
    exact-substring dedup — the LEXICAL twin of
    ``streaming_ivf_dedup_gate`` (r14 verdict #3): each micro-batch of
    (doc_id, text) rows is first VERDICTED against the admitted corpus
    (``operators/dedup.cross_doc_gate_decisions`` — 'dup_span' iff the
    doc shares a >= min_span verbatim token run with an admitted doc),
    the decisions written to ``decisions_sink``, and only then are the
    batch's winnow fingerprint rows merged into the index store and its
    texts into the docs store. The winnow fingerprint index rides the
    ``streaming_bm25_index`` store skeleton: documents are immutable
    and append-only, so (doc_id, fp) rows never change — a crash-
    replayed micro-batch re-upserts byte-identical rows and both stores
    converge (the postings-store replay argument).

    Ordering matters and is forced: the decisions write fully
    materializes the gate BEFORE either store merge rewrites the
    parquet the gate read from (gate-then-ingest).

    Replay semantics (the dedup_ivf_stream_gate contract): STORES
    converge under crash replay (byte-identical upserts). DECISIONS are
    at-least-once — re-gating an already-ingested batch sees its own
    batch-mates in the store (self-pairs ARE excluded), so a replayed
    verdict can flip 'new' -> 'dup_span' and a dup row's (match_id,
    span_tokens, n_matches) can strengthen toward the larger admitted
    corpus — monotone toward more dedup, never the reverse. Exactly-
    once decisions would need the sink's epoch guard + a store-side
    epoch column; out of contract here.

    One Arrow winnow extraction per batch: the fingerprint rows are
    computed once (localCheckpoint) and feed BOTH the gate's candidate
    join and the index-store merge."""
    import os

    from flink_streaming_demo_spark.operators import dedup as D

    for sink, want_key, name, need_read in (
        (docs_sink, ["doc_id"], "docs_sink", True),
        (fps_sink, ["doc_id", "fp"], "fps_sink", True),
        (decisions_sink, ["doc_id"], "decisions_sink", False),
    ):
        if not hasattr(sink, "foreach_batch"):
            raise TypeError(
                f"streaming_crossdoc_dedup_gate needs keyed upsert "
                f"sinks; {name} is {type(sink).__name__}"
            )
        if need_read and not (hasattr(sink, "path") and hasattr(sink, "read")):
            raise TypeError(
                f"streaming_crossdoc_dedup_gate reads {name} back; it "
                f"must be store-backed, got {type(sink).__name__}"
            )
        if getattr(sink, "key_cols", None) != want_key:
            raise ValueError(
                f"{name} key_cols must be {want_key}, got "
                f"{getattr(sink, 'key_cols', None)}"
            )

    kwargs = {}
    if min_span is not None:
        kwargs["min_span"] = min_span
    if max_fp_df is not None:
        kwargs["max_fp_df"] = max_fp_df
    if max_gram_df is not None:
        kwargs["max_gram_df"] = max_gram_df

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.head(1):
            return
        from flink_streaming_demo_spark.functions.text import (
            winnow_fp_rows,
        )

        spark = batch_df.sparkSession
        batch = batch_df.select("doc_id", "text").localCheckpoint(
            eager=False
        )
        base_docs = (
            docs_sink.read(spark)
            if os.path.exists(docs_sink.path)
            else None
        )
        base_fps = (
            fps_sink.read(spark) if os.path.exists(fps_sink.path) else None
        )
        inc_fps = winnow_fp_rows(batch).localCheckpoint(eager=False)
        decisions = D.cross_doc_gate_decisions(
            base_docs, base_fps, batch, incoming_fps=inc_fps, **kwargs
        )
        # decisions must be materialized BEFORE the store merges mutate
        # the parquet they are derived from; the lazy checkpoint keeps
        # that ordering (it materializes inside the decisions-store
        # write, which runs before either merge) without the eager
        # form's separate materialization job per batch (r15).
        decisions_sink.foreach_batch(
            decisions.localCheckpoint(eager=False), epoch_id
        )
        # The two ingest merges touch disjoint stores and read only
        # checkpointed inputs (inc_fps / batch), so they are independent
        # once the decisions write above has materialized the gate —
        # run them concurrently (r16, guide §2.6). Ordering contract
        # unchanged: both merges start after the decisions write
        # returns and the body joins both before returning.
        _overlap_merges(
            (docs_sink, batch), (fps_sink, inc_fps), epoch_id
        )

    return body


def crossdoc_admitted_view(spark, docs_sink, decisions_sink):
    """Serving-side read view over the cross-doc gate's stores: the
    cleaned corpus = every admitted doc whose decision is 'new' — what
    a training-data pipeline actually feeds downstream after the gate.
    The gate ingests EVERY batch doc (decisions are a separate keyed
    table, the dedup_ivf_stream_gate convention), so the view is a
    keyed anti-join of the docs store against the flagged slice of the
    decisions store — both bucketed parquet reads, the verdict filter
    pushed into the decisions scan. A doc with no decision row (stores
    written outside the gate body) is conservatively KEPT: decisions
    are at-least-once, so absence means 'never gated', not 'dup'.

    Reads tolerate never-written stores (a view arriving before the
    first non-empty micro-batch) by returning an empty, correctly-typed
    frame — the ivf_topk_view contract."""
    import os

    from pyspark.sql import functions as F

    if not os.path.exists(docs_sink.path):
        return spark.createDataFrame([], "doc_id bigint, text string")
    docs = docs_sink.read(spark).select("doc_id", "text")
    if not os.path.exists(decisions_sink.path):
        return docs
    flagged = (
        decisions_sink.read(spark)
        .filter(F.col("verdict") == "dup_span")
        .select("doc_id")
    )
    return docs.join(flagged, "doc_id", "left_anti")
