package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.exact.{DedupConfig, ExactDedup}

/** Incremental (streaming) exact dedup — the dupd scan performed as files
  * LAND instead of as a batch rescan: each arriving row is digested
  * map-side, checked against the STORED scan db (an unhinted stream-static
  * join: shuffled at scale, auto-broadcast only when the db measures small
  * — the dupd scan/query split's db playing its hash-cache role,
  * /root/reference/src/dbops.c:84-96), and checked against everything seen
  * so far IN the stream via custom keyed state (flatMapGroupsWithState on
  * (size, hash), /root/reference/docs/design.md:9-28's incremental intent).
  *
  * Statuses: `DB_DUP` — content already recorded as duplicated in the
  * stored db; `STREAM_DUP` — second-or-later in-stream occurrence;
  * `FIRST` — first sighting. FIRST is decided by ARRIVAL order (that is
  * the streaming operator's real semantics); within a micro-batch a
  * group's rows are folded in file_id order so intra-batch arrival is
  * deterministic. The batch twin [[batchClassify]] models arrival order as
  * file_id order, so stream ≡ batch row for row whenever ids land in
  * nondecreasing order across micro-batches — trivially true for a
  * single-batch source (the fixture: one parquet file under AvailableNow,
  * asserted in PipelineSpec; batchClassify is the oracle-checked
  * q_incr_dedup) and for monotonically-assigned ingest ids. Out-of-order
  * late arrivals keep correct DUP/FIRST *partitioning* — only which member
  * is labeled FIRST can differ from the batch replay.
  *
  * State is one (size, hash) → (firstId, n) row per distinct content — at
  * cluster scale that state IS the scan db, so a production deployment
  * periodically compacts it into the stored db and restarts the stream
  * against the compacted db (exactly dupd's cache lifecycle); hence
  * NoTimeout here rather than a fake watermark on data with no event time.
  */
object IncrementalDedup {

  case class SeenState(firstId: Long, n: Long)
  case class RowStatus(file_id: Long, size: Long, hash: String, status: String)

  /** Batch twin (oracle-checked as q_incr_dedup): classify every scanned
    * corpus row against the stored db's (size, hash) key set. */
  def batchClassify(corpus: DataFrame, dbKeys: DataFrame,
                    cfg: DedupConfig = DedupConfig()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ExactDedup.scanFilter(corpus, cfg)
      .withColumn("hash", ExactDedup.digest(col("content"), cfg))
      .join(dbKeys.select("size", "hash").distinct()
        .withColumn("__indb", lit(true)), Seq("size", "hash"), "left")
      .withColumn("__rn", row_number().over(
        Window.partitionBy("size", "hash").orderBy("file_id")))
      .withColumn("status",
        when(col("__indb"), "DB_DUP")
          .when(col("__rn") > 1, "STREAM_DUP")
          .otherwise("FIRST"))
      .select("file_id", "size", "hash", "status")
  }

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming form: the corpus lands as a file stream (same construction
    * as the batch corpus — every step stateless), digests computed
    * map-side, db membership via a stream-static join, in-stream dedup via
    * keyed custom state. Memory sink; callers processAllAvailable() then
    * read `queryName`.
    *
    * The db join carries NO broadcast hint: the stored scan db has one key
    * per distinct content, so at 10^9+ distinct contents a forced broadcast
    * is a multi-GB build rebuilt into every executor per micro-batch — a
    * driver/executor OOM at exactly the scale this operator exists for.
    * Unhinted, Spark broadcasts only when the static side's measured size
    * is under autoBroadcastJoinThreshold (the small-db fast path happens by
    * itself) and otherwise plans a shuffled stream-static join. Callers
    * that KNOW the db is tiny (a fixture, a single repo) can still force
    * the fast path with `smallDb = true`. */
  def stream(spark: SparkSession, sfDir: String, queryName: String,
             dbKeys: DataFrame,
             cfg: DedupConfig = DedupConfig(),
             smallDb: Boolean = false): StreamingQuery = {
    import spark.implicits._
    val docs = spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
    val dbk0 = dbKeys.select("size", "hash").distinct()
      .withColumn("__indb", lit(true))
    val dbk = if (smallDb) broadcast(dbk0) else dbk0
    val scanned = ExactDedup.scanFilter(graft.Tables.corpusOf(docs), cfg)
      .withColumn("hash", ExactDedup.digest(col("content"), cfg))
      .join(dbk, Seq("size", "hash"), "left")
      .select(col("file_id"), col("size"), col("hash"),
        coalesce(col("__indb"), lit(false)).as("indb"))

    val out = scanned.as[(Long, Long, String, Boolean)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[SeenState, RowStatus](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((size, hash), rows, state: GroupState[SeenState]) =>
          // fold in file_id order so arrival order inside a micro-batch
          // cannot change which row is FIRST (determinism = batch parity)
          val sorted = rows.toArray.sortBy(_._1)
          var st = state.getOption.orNull
          val emitted = sorted.map { case (id, _, _, indb) =>
            val status =
              if (indb) "DB_DUP"
              else if (st != null) "STREAM_DUP"
              else "FIRST"
            st = if (st == null) SeenState(id, 1L) else st.copy(n = st.n + 1L)
            RowStatus(id, size, hash, status)
          }
          state.update(st)
          emitted.iterator
      }
    out.toDF().writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
