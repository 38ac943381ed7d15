"""Incremental streaming burst monitor — the production form of
operators/timeseries.burst_detection: an event stream updates a
persisted (key, bucket, n) COUNT store per micro-batch, and the alert
table is recomputed from the store's trailing windows — so the
monitor sees corpus-lifetime baselines, not just the current batch.

The store is ADDITIVE (per-bucket counts sum across batches), which
makes the final state — and therefore ``alerts()`` — independent of
micro-batch BOUNDARIES entirely: after any partition of the same
events into batches, ``alerts()`` equals the batch operator
``burst_detection`` over the full event set (pinned in
tests/test_burst_monitor.py). That is a stronger determinism
guarantee than the dedup loops can offer (their survivor choice is
order-dependent by nature); it is why the st04 registry row carries a
REAL hash oracle (the x61 SQL) rather than a rows-only check.

Scale shape: each micro-batch is one batch-sized hash aggregation +
a store-sized merge aggregation; the store is (keys × observed
buckets) — dimension-sized by construction, never event-scale. The
merged store is localCheckpointed before the overwrite (reading and
rewriting the same path in one lazy plan is the classic
read-your-own-write corruption; the checkpoint materializes first —
the ingest.py precedent, and the store is bounded so the checkpoint
is too). Alerts run :func:`burst_flags` — one key-partitioned window
over the store."""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "IncrementalBurstMonitor",
    "IncrementalOhlcStore",
    "IncrementalActiveUsers",
    "IncrementalQuantiles",
    "IncrementalCusumMonitor",
    "IncrementalCategoryMix",
]


class IncrementalBurstMonitor:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_col: str = "event_type",
        ts_col: str = "ts",
        bucket_unit: str = "hour",
        trailing: int = 24,
        factor: float = 3.0,
        min_baseline_buckets: int = 3,
    ) -> None:
        if bucket_unit not in ("minute", "hour", "day", "week", "month"):
            raise ValueError(f"unsupported bucket_unit {bucket_unit!r}")
        self.spark = spark
        self.root = root
        self.key_col = key_col
        self.ts_col = ts_col
        self.bucket_unit = bucket_unit
        self.trailing = trailing
        self.factor = factor
        self.min_baseline_buckets = min_baseline_buckets
        self.store_dir = os.path.join(root, "bucket_counts")

    def _store(self) -> Optional[DataFrame]:
        if not os.path.isdir(self.store_dir):
            return None
        return self.spark.read.parquet(self.store_dir)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """Aggregate the batch to (key, bucket, n) and MERGE into the
        store (counts add). Runs identically under foreachBatch and in
        a plain loop."""
        counts = (
            batch.where(
                F.col(self.key_col).isNotNull()
                & F.col(self.ts_col).isNotNull()
            )
            .groupBy(
                F.col(self.key_col),
                F.date_trunc(self.bucket_unit, F.col(self.ts_col)).alias(
                    "bucket"
                ),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        store = self._store()
        merged = (
            counts if store is None else store.unionByName(counts)
        ).groupBy(self.key_col, "bucket").agg(
            F.sum("n").cast("long").alias("n")
        )
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(self.store_dir)

    def alerts(self) -> DataFrame:
        """Burst table over the CURRENT store state — identical to
        batch burst_detection over every event the monitor has seen."""
        from ai_etl_framework_spark.operators.timeseries import burst_flags

        store = self._store()
        if store is None:
            raise ValueError("no events processed yet: store is empty")
        return burst_flags(
            store,
            self.key_col,
            trailing=self.trailing,
            factor=self.factor,
            min_baseline_buckets=self.min_baseline_buckets,
        )

    def run_stream(
        self,
        bronze_dir: str,
        checkpoint_dir: str,
        schema,
        max_files_per_trigger: int = 1,
        timeout_sec: int = 300,
    ) -> None:
        """Drive the loop over a file-source stream to completion
        (Trigger.AvailableNow)."""
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(bronze_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"burst monitor stream did not finish in {timeout_sec}s"
            )

    def run_batches(self, batches) -> None:
        for i, b in enumerate(batches):
            self.process_batch(b, i)


class IncrementalOhlcStore:
    """Streaming OHLC candle service — the incremental twin of
    operators/timeseries.ohlc_bars: each micro-batch folds its ticks
    into a persisted per-(key, bucket) candle store. Every candle
    component is MERGEABLE (open/close carry their BIGINT position
    keys so min_by/max_by re-reduce exactly; high/low/volume/n are
    plain min/max/sum), so the final store is independent of
    micro-batch boundaries and ``candles()`` equals the batch operator
    over all ticks seen — the st04 argument again, giving this
    streaming row a real hash oracle (x49's SQL).

    Store columns: (key, bucket, open_k, open, high, low, close_k,
    close, volume, n) — the position keys stay INSIDE the store;
    ``candles()`` projects the public OHLC shape with the operator's
    rounding. Scale: batch-sized candle agg + store-sized merge agg
    per batch; the store is (keys × observed buckets)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_col: str = "event_type",
        ts_col: str = "ts",
        value_col: str = "value",
        tiebreak_col: str = "event_id",
        bucket_unit: str = "hour",
    ) -> None:
        if bucket_unit not in ("minute", "hour", "day", "week", "month"):
            raise ValueError(f"unsupported bucket_unit {bucket_unit!r}")
        self.spark = spark
        self.root = root
        self.key_col = key_col
        self.ts_col = ts_col
        self.value_col = value_col
        self.tiebreak_col = tiebreak_col
        self.bucket_unit = bucket_unit
        self.store_dir = os.path.join(root, "candles")

    def _store(self) -> Optional[DataFrame]:
        if not os.path.isdir(self.store_dir):
            return None
        return self.spark.read.parquet(self.store_dir)

    def _batch_candles(self, batch: DataFrame) -> DataFrame:
        from ai_etl_framework_spark.operators.timeseries import _pos_key

        k = _pos_key(self.ts_col, self.tiebreak_col)
        v = F.col(self.value_col)
        return (
            batch.where(
                F.col(self.key_col).isNotNull()
                & F.col(self.ts_col).isNotNull()
                & v.isNotNull()
            )
            .groupBy(
                F.col(self.key_col),
                F.date_trunc(self.bucket_unit, F.col(self.ts_col)).alias(
                    "bucket"
                ),
            )
            .agg(
                F.min(k).alias("open_k"),
                F.min_by(v, k).alias("open"),
                F.max(v).alias("high"),
                F.min(v).alias("low"),
                F.max(k).alias("close_k"),
                F.max_by(v, k).alias("close"),
                F.sum(v).alias("volume"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
        )

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        part = self._batch_candles(batch)
        store = self._store()
        merged = (
            part if store is None else store.unionByName(part)
        ).groupBy(self.key_col, "bucket").agg(
            F.min("open_k").alias("open_k"),
            F.min_by(F.col("open"), F.col("open_k")).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max("close_k").alias("close_k"),
            F.max_by(F.col("close"), F.col("close_k")).alias("close"),
            F.sum("volume").alias("volume"),
            F.sum("n").cast("long").alias("n"),
        )
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(self.store_dir)

    def candles(self) -> DataFrame:
        """Public OHLC table over the store — the ohlc_bars shape and
        rounding."""
        store = self._store()
        if store is None:
            raise ValueError("no ticks processed yet: store is empty")
        return store.select(
            self.key_col,
            "bucket",
            F.round("open", 6).alias("open"),
            F.round("high", 6).alias("high"),
            F.round("low", 6).alias("low"),
            F.round("close", 6).alias("close"),
            F.round("volume", 6).alias("volume"),
            "n",
        )

    def run_stream(
        self,
        bronze_dir: str,
        checkpoint_dir: str,
        schema,
        max_files_per_trigger: int = 1,
        timeout_sec: int = 300,
    ) -> None:
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(bronze_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"ohlc store stream did not finish in {timeout_sec}s"
            )

    def run_batches(self, batches) -> None:
        for i, b in enumerate(batches):
            self.process_batch(b, i)


class IncrementalActiveUsers:
    """Streaming rolling-active-users service — the incremental twin
    of operators/activity.rolling_active_users: each micro-batch
    collapses to its distinct (user, day) pairs and MERGES into a
    persisted activity-day store (union + distinct — idempotent and
    commutative, the strongest mergeability there is: re-delivered
    events are absorbed, so the store is independent of micro-batch
    boundaries AND of at-least-once replays). ``curve()`` runs the
    sweep-line core over the store, so it equals the batch operator
    over every event seen — the st04 argument; the st06 registry row
    therefore carries x86's REAL hash oracle (which is itself the
    NAIVE per-day COUNT DISTINCT definition).

    Scale shape per batch: one batch-sized distinct + one store-sized
    distinct merge; the store is the (users × active days) frame —
    the same frame ANY correct rolling-distinct needs, persisted once
    instead of recomputed per refresh. Compact it on the maintenance
    cadence like the dedup stores."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        user_col: str = "user_id",
        ts_col: str = "ts",
        window_days: int = 7,
    ) -> None:
        if window_days < 1:
            raise ValueError(f"window_days must be >= 1, got {window_days}")
        self.spark = spark
        self.root = root
        self.user_col = user_col
        self.ts_col = ts_col
        self.window_days = window_days
        self.store_dir = os.path.join(root, "active_days")

    def _store(self) -> Optional[DataFrame]:
        if not os.path.isdir(self.store_dir):
            return None
        return self.spark.read.parquet(self.store_dir)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        days = (
            batch.where(
                F.col(self.user_col).isNotNull()
                & F.col(self.ts_col).isNotNull()
            )
            .select(
                F.col(self.user_col).alias("u"),
                F.to_date(self.ts_col).alias("d"),
            )
            .distinct()
        )
        store = self._store()
        merged = (
            days if store is None else store.unionByName(days).distinct()
        )
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(self.store_dir)

    def curve(self) -> DataFrame:
        """(day, active_users) over everything seen — identical to the
        batch operator on the full event set."""
        from ai_etl_framework_spark.operators.activity import (
            rolling_active_from_days,
        )

        store = self._store()
        if store is None:
            raise ValueError("no events processed yet: store is empty")
        return rolling_active_from_days(store, self.window_days)

    def new_returning(self) -> DataFrame:
        """New-vs-returning decomposition over everything seen — the
        SAME persisted (user, day) store, second readout (st10; the
        store is idempotent-distinct, so this equals the batch
        operator over the full event set — st06's argument verbatim,
        and the st10 registry row carries x127's REAL hash oracle)."""
        from ai_etl_framework_spark.operators.activity import (
            new_returning_from_days,
        )

        store = self._store()
        if store is None:
            raise ValueError("no events processed yet: store is empty")
        # the store's frame is (u, d); the seam's contract is (u, day)
        return new_returning_from_days(
            store.select("u", F.col("d").alias("day"))
        )

    def run_stream(
        self,
        bronze_dir: str,
        checkpoint_dir: str,
        schema,
        max_files_per_trigger: int = 1,
        timeout_sec: int = 300,
    ) -> None:
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(bronze_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"active-users stream did not finish in {timeout_sec}s"
            )

    def run_batches(self, batches) -> None:
        for i, b in enumerate(batches):
            self.process_batch(b, i)


class IncrementalQuantiles:
    """Streaming latency/value-quantile service — the incremental twin
    of operators/scaling.binned_quantiles: each micro-batch bins its
    values to ``floor(v/width)`` and MERGES the counts into a
    persisted (key, bin, n) histogram store. Bin counts are ADDITIVE
    (sum is commutative+associative), so the store — and therefore
    ``quantiles()`` — is independent of micro-batch boundaries: after
    any partition of the same events into batches it equals the batch
    operator over the full set (the st04 argument), which is why the
    st07 registry row carries a REAL hash oracle (x95's SQL). Like
    st04/st05 (and unlike st06's idempotent distinct store), additive
    counts do NOT absorb at-least-once replays — pair with upstream
    exactly-once file semantics or an id-dedup stage.

    ``quantiles()`` runs :func:`quantiles_from_bins` — the SAME code
    path the batch operator uses (the rolling_active_from_days seam).

    Scale shape per batch: one batch-sized hash aggregation + one
    store-sized merge; the store is |keys|·(value range/width) rows —
    bounded by the DOMAIN, not the corpus, so it never compacts."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        value_col: str = "value",
        key_col: str = "event_type",
        width: float = 5.0,
        qs: tuple = (0.5, 0.95, 0.99),
    ) -> None:
        if width <= 0:
            raise ValueError(f"width must be > 0, got {width}")
        self.spark = spark
        self.root = root
        self.value_col = value_col
        self.key_col = key_col
        self.width = width
        self.qs = qs
        self.store_dir = os.path.join(root, "value_bins")

    def _store(self) -> Optional[DataFrame]:
        if not os.path.isdir(self.store_dir):
            return None
        return self.spark.read.parquet(self.store_dir)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """Bin the batch and MERGE into the store (counts add). Runs
        identically under foreachBatch and in a plain loop."""
        bins = (
            batch.where(
                F.col(self.key_col).isNotNull()
                & F.col(self.value_col).isNotNull()
            )
            .groupBy(
                F.col(self.key_col),
                F.floor(F.col(self.value_col) / F.lit(self.width))
                .cast("long")
                .alias("bin"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        store = self._store()
        merged = (
            bins if store is None else store.unionByName(bins)
        ).groupBy(self.key_col, "bin").agg(
            F.sum("n").cast("long").alias("n")
        )
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(self.store_dir)

    def quantiles(self) -> DataFrame:
        """Quantile table over the CURRENT store — identical to batch
        binned_quantiles over every event the service has seen."""
        from ai_etl_framework_spark.operators.scaling import (
            quantiles_from_bins,
        )

        store = self._store()
        if store is None:
            raise ValueError("no events processed yet: store is empty")
        return quantiles_from_bins(
            store, self.width, self.qs, key_col=self.key_col
        )

    def run_stream(
        self,
        bronze_dir: str,
        checkpoint_dir: str,
        schema,
        max_files_per_trigger: int = 1,
        timeout_sec: int = 300,
    ) -> None:
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(bronze_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"quantile service stream did not finish in {timeout_sec}s"
            )

    def run_batches(self, batches) -> None:
        for i, b in enumerate(batches):
            self.process_batch(b, i)


class IncrementalCusumMonitor:
    """Streaming CUSUM drift monitor — the incremental twin of
    operators/timeseries.cusum_screen: each micro-batch folds its
    per-(key, bucket) value SUMS and COUNTS into a persisted store
    (both additive ⇒ the bucket MEAN sum/n re-derives exactly), and
    ``screen()`` runs cusum_from_series over the store's mean series —
    the same code path as the batch operator, so the st08 registry
    row carries x96's REAL hash oracle. Boundary-independent like
    st04/st05/st07; additive sums do NOT absorb at-least-once replays
    (same caveat).

    Scale shape per batch: one batch-sized hash aggregation + one
    store-sized merge; the store is (keys × observed buckets) — the
    burst monitor's bound."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        value_col: str = "value",
        key_col: str = "event_type",
        ts_col: str = "ts",
        bucket_unit: str = "day",
        slack: float = 0.5,
        threshold: float = 4.0,
    ) -> None:
        if bucket_unit not in ("minute", "hour", "day", "week", "month"):
            raise ValueError(f"unsupported bucket_unit {bucket_unit!r}")
        self.spark = spark
        self.root = root
        self.value_col = value_col
        self.key_col = key_col
        self.ts_col = ts_col
        self.bucket_unit = bucket_unit
        self.slack = slack
        self.threshold = threshold
        self.store_dir = os.path.join(root, "bucket_moments")

    def _store(self) -> Optional[DataFrame]:
        if not os.path.isdir(self.store_dir):
            return None
        return self.spark.read.parquet(self.store_dir)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        moments = (
            batch.where(
                F.col(self.key_col).isNotNull()
                & F.col(self.ts_col).isNotNull()
                & F.col(self.value_col).isNotNull()
            )
            .groupBy(
                F.col(self.key_col),
                F.date_trunc(self.bucket_unit, F.col(self.ts_col)).alias(
                    "bucket"
                ),
            )
            .agg(
                F.sum(self.value_col).alias("s"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
        )
        store = self._store()
        merged = (
            moments if store is None else store.unionByName(moments)
        ).groupBy(self.key_col, "bucket").agg(
            F.sum("s").alias("s"), F.sum("n").cast("long").alias("n")
        )
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(self.store_dir)

    def screen(self) -> DataFrame:
        """CUSUM table over the CURRENT store — identical to batch
        cusum_screen over every event the monitor has seen, up to the
        float note below: the store mean is sum/n over MERGED partial
        sums, associativity-equal to the batch mean (documented; the
        6dp rounding absorbs the last-ulp difference in practice and
        the stream==batch equality test pins it)."""
        from ai_etl_framework_spark.operators.timeseries import (
            cusum_from_series,
        )

        store = self._store()
        if store is None:
            raise ValueError("no events processed yet: store is empty")
        series = store.select(
            self.key_col,
            "bucket",
            (F.col("s") / F.col("n")).alias("__x"),
        )
        return cusum_from_series(
            series, [self.key_col], slack=self.slack,
            threshold=self.threshold,
        )

    def run_stream(
        self,
        bronze_dir: str,
        checkpoint_dir: str,
        schema,
        max_files_per_trigger: int = 1,
        timeout_sec: int = 300,
    ) -> None:
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(bronze_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"cusum monitor stream did not finish in {timeout_sec}s"
            )

    def run_batches(self, batches) -> None:
        for i, b in enumerate(batches):
            self.process_batch(b, i)


class IncrementalCategoryMix:
    """Streaming categorical-mix drift service — the incremental twin
    of operators/drift.jsd_drift: each micro-batch collapses to its
    (period, category) counts and MERGES them additively into a
    persisted cell store (sum is commutative + associative, the st04
    argument), so ``jsd()`` — which runs
    :func:`~ai_etl_framework_spark.operators.drift.jsd_from_cells`,
    the SAME core the batch operator uses — is independent of
    micro-batch boundaries and equals the batch operator over every
    event seen. The st09 registry row therefore carries x121's REAL
    hash oracle. Like st04/st05/st07 (and unlike st06's idempotent
    distinct store), additive counts do NOT absorb at-least-once
    replays — pair with upstream exactly-once file semantics or an
    id-dedup stage.

    Scale shape per batch: one batch-sized (period, category) hash
    aggregation + one store-sized merge aggregation; the store is the
    periods × categories cell frame — dimension-bounded by
    construction, persisted once instead of recomputed per refresh.
    Compact it on the maintenance cadence like the dedup stores."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        cat_col: str = "event_type",
        ts_col: str = "ts",
        bucket_unit: str = "day",
    ) -> None:
        self.spark = spark
        self.root = root
        self.cat_col = cat_col
        self.ts_col = ts_col
        self.bucket_unit = bucket_unit
        self.store_dir = os.path.join(root, "mix_cells")

    def _store(self) -> Optional[DataFrame]:
        if not os.path.isdir(self.store_dir):
            return None
        return self.spark.read.parquet(self.store_dir)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        cells = (
            batch.where(
                F.col(self.cat_col).isNotNull()
                & F.col(self.ts_col).isNotNull()
            )
            .select(
                F.date_trunc(self.bucket_unit, F.col(self.ts_col))
                .cast("date")
                .alias("per"),
                F.col(self.cat_col).alias("cat"),
            )
            .groupBy("per", "cat")
            .agg(F.count(F.lit(1)).cast("double").alias("n_pc"))
        )
        store = self._store()
        if store is not None:
            cells = (
                store.unionByName(cells)
                .groupBy("per", "cat")
                .agg(F.sum("n_pc").alias("n_pc"))
            )
        cells = cells.localCheckpoint(eager=True)
        cells.write.mode("overwrite").parquet(self.store_dir)

    def jsd(self, period_name: str = "period") -> DataFrame:
        """(period_name, n, n_categories, jsd) over everything seen —
        identical to the batch operator on the full event set."""
        from ai_etl_framework_spark.operators.drift import jsd_from_cells

        store = self._store()
        if store is None:
            raise ValueError("no events processed yet: store is empty")
        return jsd_from_cells(store, period_name)

    def run_stream(
        self,
        bronze_dir: str,
        checkpoint_dir: str,
        schema,
        max_files_per_trigger: int = 1,
        timeout_sec: int = 300,
    ) -> None:
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(bronze_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"category-mix stream did not finish in {timeout_sec}s"
            )

    def run_batches(self, batches) -> None:
        for i, b in enumerate(batches):
            self.process_batch(b, i)


class IncrementalHeavyHitters:
    """Streaming heavy-hitters / key-skew service — the incremental
    twin of operators/audit.skew_report: each micro-batch collapses
    to its per-key counts and MERGES them additively into a persisted
    key store (sum is commutative + associative, the st04 argument),
    so ``report()`` — which runs
    :func:`~ai_etl_framework_spark.operators.audit.skew_report_from_counts`,
    the SAME rider/top-k core the batch advisor uses — is independent
    of micro-batch boundaries and equals the batch operator over
    every event seen. The st11 registry row therefore carries a REAL
    hash oracle (x131's SQL shape over the same input). Like
    st04/st05/st07/st09 (and unlike st06's idempotent distinct
    store), additive counts do NOT absorb at-least-once replays —
    pair with upstream exactly-once file semantics or an id-dedup
    stage.

    Scale shape per batch: one batch-sized key hash aggregation + one
    store-sized merge aggregation. The store is the |distinct keys|
    frame — exactly the thing being measured (skew_report's
    contract); for key spaces too large to persist exactly, a
    Misra-Gries bounded-memory variant would trade the exact oracle
    for an ε-approximate one — out of scope here, documented so the
    100 TB deployment decision is explicit."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_col: str = "user_id",
    ) -> None:
        self.spark = spark
        self.root = root
        self.key_col = key_col
        self.store_dir = os.path.join(root, "hh_counts")

    def _store(self) -> Optional[DataFrame]:
        if not os.path.isdir(self.store_dir):
            return None
        return self.spark.read.parquet(self.store_dir)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        # NULL keys are KEPT (as their own group): skew_report pins
        # NULL as a key value — usually the heaviest skew culprit
        counts = batch.groupBy(F.col(self.key_col).alias("k")).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        store = self._store()
        if store is not None:
            counts = (
                store.unionByName(counts)
                .groupBy("k")
                .agg(F.sum("n").cast("long").alias("n"))
            )
        counts = counts.localCheckpoint(eager=True)
        counts.write.mode("overwrite").parquet(self.store_dir)

    def report(self, top_k: int = 20) -> DataFrame:
        """skew_report over everything seen — (rank, key, n, share,
        n_rows, n_keys, hhi, max_share), identical to the batch
        advisor on the full event set."""
        from ai_etl_framework_spark.operators.audit import (
            skew_report_from_counts,
        )

        store = self._store()
        if store is None:
            raise ValueError("no events processed yet: store is empty")
        return skew_report_from_counts(
            store.withColumnRenamed("k", self.key_col),
            [self.key_col],
            top_k,
        )

    def run_stream(
        self,
        bronze_dir: str,
        checkpoint_dir: str,
        schema,
        max_files_per_trigger: int = 1,
        timeout_sec: int = 300,
    ) -> None:
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(bronze_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"heavy-hitters stream did not finish in {timeout_sec}s"
            )

    def run_batches(self, batches) -> None:
        for i, b in enumerate(batches):
            self.process_batch(b, i)
