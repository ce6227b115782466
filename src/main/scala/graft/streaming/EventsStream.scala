package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming surface over the events table. The reference has no
  * streaming tier (SURVEY.md §2.9) — this is the training-pipeline
  * extension: a windowed aggregation that runs identically in batch (the
  * oracle-checked path) and as a stream (watermark + tumbling window,
  * memory-sink tested).
  *
  * Sums are kept in integer cents so batch, streaming, and the DuckDB oracle
  * agree bit-for-bit regardless of partial-aggregation order.
  */
object EventsStream {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The shared aggregation: 5-minute tumbling windows per event_type.
    * Window key is epoch seconds (bigint) for engine-neutral comparison. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withColumn("window_start",
        expr("(unix_timestamp(ts) div 300) * 300"))
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .groupBy("window_start", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("cents").as("value_cents"),
        countDistinct(col("user_id")).as("n_users"))

  /** Batch form (oracle-checked). */
  def batch(spark: SparkSession, sfDir: String): DataFrame =
    windowedAgg(spark.read.parquet(s"$sfDir/events.parquet"))

  /** Streaming form: same aggregation as a file-source stream with a
    * watermark + event-time tumbling window, complete-mode memory sink.
    * Returns the running query; callers processAllAvailable() then read the
    * `queryName` table. */
  def stream(spark: SparkSession, sfDir: String, queryName: String): StreamingQuery = {
    // the streaming file source wants a directory; select the one table
    // via glob filter
    val events = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val agg = events
      .withWatermark("ts", "10 minutes")
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum("cents").as("value_cents"),
        approx_count_distinct("user_id").as("n_users_approx"))
      .select(unix_timestamp(col("window.start")).cast("long").as("window_start"),
        col("event_type"), col("n_events"), col("value_cents"), col("n_users_approx"))
    agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** EXACT distinct users per window as a stream: streaming aggregation
    * cannot hold countDistinct state, but stateful deduplication CAN feed an
    * aggregation — dedup on (window, event_type, user_id) followed by
    * count(*) is the standard exact-distinct streaming plan. Closes the
    * batch ≡ stream gap on n_users (the main stream reports
    * approx_count_distinct; PipelineSpec asserts both).
    * dropDuplicatesWithinWatermark (not plain dropDuplicates) so the dedup
    * state is EVICTABLE once the watermark passes — plain dropDuplicates on
    * a subset without the event-time column keeps one state row per
    * (window, type, user) forever, an unbounded-state leak on a real
    * stream; a duplicate arriving past the watermark belongs to an
    * already-closed window anyway. */
  def streamUsersExact(spark: SparkSession, sfDir: String,
                       queryName: String): StreamingQuery = {
    val events = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val agg = events
      .withWatermark("ts", "10 minutes")
      .withColumn("window_start", expr("(unix_timestamp(ts) div 300) * 300"))
      .dropDuplicatesWithinWatermark("window_start", "event_type", "user_id")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_users"))
      .select(unix_timestamp(col("window.start")).cast("long").as("window_start"),
        col("event_type"), col("n_users"))
    agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Per-user session state carried across micro-batches: the currently
    * open session (start/end epoch seconds, event count). */
  case class OpenSession(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Long,
                        session_end: Long, n_events: Long)

  /** TRUE streaming sessionization via flatMapGroupsWithState: per-user
    * custom state (the open session), closed sessions emitted as soon as a
    * gap > `gapMinutes` is observed, the final open session flushed by
    * event-time timeout once the watermark passes its gap horizon. The
    * KeyValueGroupedDataset custom-state path of the training-pipeline
    * streaming tier; the batch twin is [[sessions]] (lag/cumsum).
    *
    * Within a micro-batch events arrive unordered — the handler sorts the
    * batch's timestamps before folding them into the state (per-user
    * per-batch volumes are bounded; out-of-order ACROSS batches is handled
    * by the watermark exactly as in the windowed agg). */
  def streamSessions(spark: SparkSession, sfDir: String, queryName: String,
                     gapMinutes: Int = 30): StreamingQuery = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapSec = gapMinutes * 60L
    val events = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"),
        col("ts"))

    val out = events.as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[OpenSession]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed the open session's gap horizon: close it
            val s = state.get
            state.remove()
            Iterator(SessionOut(uid, s.start, s.end, s.n))
          } else {
            val ts = rows.map(_._2).toArray
            java.util.Arrays.sort(ts)
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption.orNull
            ts.foreach { t =>
              cur match {
                case null => cur = OpenSession(t, t, 1)
                case s if t - s.end > gapSec =>
                  closed += SessionOut(uid, s.start, s.end, s.n)
                  cur = OpenSession(t, t, 1)
                case s => cur = OpenSession(s.start, math.max(s.end, t), s.n + 1)
              }
            }
            state.update(cur)
            // flush the open session once the watermark passes end + gap
            state.setTimeoutTimestamp((cur.end + gapSec) * 1000)
            closed.iterator
          }
      }
    out.toDF().writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stateful sessionization: per-user sessions split on > `gapMinutes`
    * idle gaps — flatMapGroupsWithState territory in continuous mode; batch
    * form uses the session-window built-in shape via lag/cumsum. */
  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L,
          1L).otherwise(0L))
      .withColumn("session_idx", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        unix_timestamp(min("ts")).cast("long").as("session_start"),
        unix_timestamp(max("ts")).cast("long").as("session_end"))
  }
}
