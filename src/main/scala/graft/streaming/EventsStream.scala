package graft.streaming

import graft.fold.FoldCol
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming binding for the fold surface (SURVEY §2.J).
  *
  * The reference's streams are bounded lazy streams; its stateful story
  * is the FoldA accumulator consumed element-by-element
  * (Repetition/Foldl.hs:80-118). Bound to an unbounded source this
  * becomes: windowed aggregation with watermarks (the fold per
  * event-time window), `foreachBatch` (the fold stepped per
  * micro-batch), and `mapGroupsWithState` (arbitrary accumulator per
  * key — `generalizeM`'s effectful fold, done right for streams).
  *
  * Scale: streaming aggregations shuffle by (window, key) with partial
  * aggregation; state store size is bounded by the watermark horizon,
  * not stream length.
  */
object EventsStream {

  /** events schema with `ts` at the given type. readStream requires
    * an explicit schema; the ts type depends on how the vendor wrote
    * the column (TIMESTAMP(NANOS) surfaces as a raw nanos LONG under
    * `nanosAsLong`, TIMESTAMP(MICROS) as a plain timestamp), so
    * [[readEvents]] mirrors the batch reader's adaptation
    * ([[graft.queries.Star.events]]) instead of hardcoding one. */
  def eventsRawSchema(tsType: DataType = TimestampType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** Unbounded read of an events directory (files appearing over time
    * = the stream). One static footer read up front decides the ts
    * shape — the same LongType guard the batch reader uses — so the
    * stream works against either vintage of the events table. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val tsIsLong =
      spark.read.parquet(dir).schema("ts").dataType == LongType
    val raw = spark.readStream
      .schema(eventsRawSchema(if (tsIsLong) LongType else TimestampType))
      .option("maxFilesPerTrigger", "8")
      .parquet(dir)
    if (tsIsLong) raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else raw
  }

  /** Event-time tumbling-window aggregation with a watermark: count +
    * sum(value) per (window, event_type). The streaming form of
    * Relational.q16_events_hourly. */
  def hourlyAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,10)")).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Watermarked stream-stream INTERVAL join: for every click, the
    * same user's purchases within `horizon` after it — attribution,
    * the canonical two-unbounded-sides join. Both sides carry a
    * watermark and the join condition bounds event-time distance, so
    * Spark can size the join state: each side buffers only rows
    * younger than (watermark + horizon), evicting as the watermark
    * advances — bounded state on an unbounded stream, the same
    * discipline as the windowed-MG eviction. Works identically on
    * batch frames (no watermark semantics, plain interval join). */
  def clickPurchaseAttribution(clicks: DataFrame, purchases: DataFrame,
                               horizon: String = "1 hour",
                               watermark: String = "2 hours")
      : DataFrame = {
    // State-correctness guard: the join buffers each side only up to
    // the watermark, so a watermark SHORTER than the attribution
    // horizon would evict purchase state while its window is still
    // open — matches silently dropped, streaming diverging from
    // batch. Fail loudly instead.
    require(intervalMicros(watermark) >= intervalMicros(horizon),
      s"watermark ($watermark) must be >= horizon ($horizon): " +
        "join state is evicted at the watermark, so a shorter " +
        "watermark drops in-horizon matches")
    val c = (if (clicks.isStreaming) clicks.withWatermark("ts", watermark)
             else clicks)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val p = (if (purchases.isStreaming)
               purchases.withWatermark("ts", watermark)
             else purchases)
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Total microseconds of an `INTERVAL`-literal body like
    * "90 minutes" (calendar months counted as 30 days — fine for the
    * duration-style strings watermarks use). */
  private def intervalMicros(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
    (iv.months * 30L + iv.days) * 86400L * 1000000L + iv.microseconds
  }

  /** Run a bounded FoldCol per micro-batch and append the batch folds
    * to `sink` — `foldStreamTask` stepped by micro-batch. */
  def foldPerBatch(events: DataFrame, sink: String): StreamingQuery = {
    val fold = FoldCol.count
      .zip(FoldCol.sumD(col("value")))
      .zip(FoldCol.countDistinctOf(col("user_id")))
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val ((n, sumV), users) = fold.run(batch.toDF())
        val spark = batch.sparkSession
        import spark.implicits._
        Seq((id, n, sumV, users))
          .toDF("batch_id", "n", "sum_value", "n_users")
          .write.mode("append").parquet(sink)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Per-user session accumulator via flatMapGroupsWithState: running
    * event count + last-seen, emitted per batch (the arbitrary-state
    * fold the reference can only do single-threaded).
    *
    * flatMap (not map) so the idle-timeout branch can remove the
    * user's state WITHOUT emitting — a mapGroupsWithState timeout must
    * return a row, which would re-send the user's last snapshot
    * (same counts, no new events) hours after the last real update,
    * and downstream sinks would see a phantom duplicate. */
  final case class UserState(nEvents: Long, lastType: String)
  final case class UserSnapshot(user_id: Long, n_events: Long,
                                last_type: String)

  def userSessions(events: DataFrame,
                   idleTimeout: String = "2 hours"): Dataset[UserSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserState, UserSnapshot](
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        case (uid, rows, state: GroupState[UserState]) =>
          // idle users age out of the state store — without a timeout
          // the per-user state grows with the all-time user population
          // instead of the active horizon
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._3.getTime, r._2))
            val prev = state.getOption.getOrElse(UserState(0L, ""))
            val next = UserState(prev.nEvents + sorted.size,
              sorted.lastOption.map(_._2).getOrElse(prev.lastType))
            state.update(next)
            state.setTimeoutDuration(idleTimeout)
            Iterator.single(UserSnapshot(uid, next.nEvents, next.lastType))
          }
      }
  }

  /** Streaming exact dedup — the streaming face of the dedup operator
    * pack: watermarked `dropDuplicatesWithinWatermark` on the content
    * keys, so the state store holds only the watermark horizon of keys
    * (bounded memory on an unbounded stream). Duplicate events (same
    * dedup columns) arriving within the horizon are emitted once —
    * including retransmissions that carry a DIFFERENT timestamp, which
    * a `dropDuplicates(keys :+ ts)` would wrongly re-emit. */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-static enrichment join: attach a static dimension to an
    * unbounded stream — the streaming form of the broadcast-dim join
    * (q04). Stateless by Spark semantics (no watermark, no join
    * state): every micro-batch plans a fresh hash join against the
    * CURRENT static side, so a dimension backed by a re-readable
    * source picks up slowly-changing updates between batches. The
    * explicit `broadcast` hint keeps the fact stream shuffle-free at
    * any rate; left join so late dimension rows can't drop events. */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Baseline event-type distribution for [[windowedDrift]]: the
    * probabilities of a reference slice (yesterday's traffic, the
    * training corpus) as a tiny `(event_type, q)` frame — computed
    * once on a BATCH frame and broadcast into the monitor. */
  def driftBaseline(events: DataFrame): DataFrame = {
    val c = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("_c"))
    c.crossJoin(c.agg(sum(col("_c")).as("_n")))
      .select(col("event_type"),
        (col("_c").cast("double") / col("_n").cast("double")).as("q"))
  }

  /** Event-time windowed distribution-drift monitor: per hourly
    * window, KL(window ‖ baseline) of the event-type distribution —
    * the streaming form of [[graft.llm.TextAnalysis.sourceDrift]]'s
    * gauge, watching live traffic drift away from a reference
    * distribution as windows close. Uses the KL identity
    * `Σ (c/n)·ln((c/n)/q) = (Σ c·ln(c/q))/n − ln n` so the
    * per-window reduce is a plain sum — two CHAINED event-time
    * windowed aggregations (type counts, then the window total),
    * the Spark 3.4+ multiple-stateful-operator shape; state per
    * window is one row per observed type, evicted at the watermark.
    * `baseline` must be a batch frame from [[driftBaseline]] (it
    * broadcasts between the two aggregations); window types missing
    * from the baseline take the `qFloor` mass so drift spikes rather
    * than silently dropping. Identical code path runs on batch
    * frames (plain two-level aggregate). Emits
    * `(window_start, n_events, kl)` per closed window. */
  def windowedDrift(events: DataFrame, baseline: DataFrame,
                    watermark: String = "2 hours",
                    windowLen: String = "1 hour",
                    qFloor: Double = 1e-9): DataFrame = {
    val wc = (if (events.isStreaming)
                events.withWatermark("ts", watermark)
              else events)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("_c"))
      .join(broadcast(baseline), Seq("event_type"), "left")
      .withColumn("_q", coalesce(col("q"), lit(qFloor)))
    wc.groupBy(window(col("window"), windowLen))
      .agg(sum(col("_c")).as("_n"),
        sum((col("_c").cast("double") *
          log(col("_c").cast("double") / col("_q")))
          .cast("decimal(38,18)")).cast("double").as("_s"))
      .select(col("window.start").as("window_start"),
        col("_n").as("n_events"),
        round(col("_s") / col("_n").cast("double") -
          log(col("_n").cast("double")), 6).as("kl"))
  }

  /** Multi-sink streaming write — the reference's write-to-every-layer
    * semantics under streaming: one stream, N sinks via foreachBatch
    * (persist the batch once, write it N times). */
  def writeLayers(df: DataFrame, sinks: Seq[String]): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val cached = batch.persist()
        try sinks.foreach(s => cached.write.mode("append").parquet(s))
        finally { cached.unpersist(); () }
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
