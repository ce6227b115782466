package graft.state

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition checkpointing + lineage + metrics — the Spark-native role
  * of dupd's SQLite state/cache db (north_rule: "resumable from checkpoint
  * with per-partition lineage + metrics"; reference analogue: the hash-cache
  * short-circuit A7, /root/reference/src/sizelist.c:695-750, and the cache
  * db schema /root/reference/src/dbops.c:84-96).
  *
  * The checkpoint unit is a SIZE-HASH BUCKET (`size % nBuckets`): every
  * dedup grouping key starts with `size`, so buckets are independent units —
  * a bucket's duplicate sets never reference rows outside it. A killed run
  * resumes by skipping buckets whose manifest row exists (the `_metrics`
  * table is both the lineage record and the completion marker). At cluster
  * scale the bucket maps to an Iceberg partition and the manifest to a
  * metadata table; here both are parquet directories.
  */
object Checkpoints {

  /** One manifest/metrics row per completed (stage, bucket). */
  final case class StageMetric(
      stage: String, bucket: Int, rows: Long, bytes: Long,
      wall_ms: Long, lineage: String, finished_at: Long)

  private def metricsPath(root: String) = s"$root/_metrics"

  def readMetrics(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    try spark.read.parquet(metricsPath(root))
    catch { case _: Exception =>
      Seq.empty[StageMetric].toDF()
    }
  }

  def completedBuckets(spark: SparkSession, root: String, stage: String): Set[Int] =
    readMetrics(spark, root)
      .filter(col("stage") === stage)
      .select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet

  /** Run `compute(bucket)` for every not-yet-done bucket, persisting each
    * bucket's output and a manifest row; returns the stage's full output
    * (all buckets, completed now or previously). `lineage` ties the output
    * to its input + config (any drift forces a fresh root). */
  def runStage(spark: SparkSession, root: String, stage: String,
               nBuckets: Int, lineage: String,
               onlyBuckets: Option[Set[Int]] = None)
              (compute: Int => DataFrame): DataFrame = {
    import spark.implicits._
    val done = completedBuckets(spark, root, stage)
    val todo = (0 until nBuckets)
      .filter(b => !done.contains(b))
      .filter(b => onlyBuckets.forall(_.contains(b)))
    todo.foreach { b =>
      val t0 = System.nanoTime()
      val out = compute(b)
      out.write.mode(SaveMode.Overwrite).parquet(s"$root/$stage/bucket=$b")
      val written = spark.read.parquet(s"$root/$stage/bucket=$b")
      val (rows, bytes) = written
        .agg(count(lit(1)), coalesce(sum(col("size")), lit(0L)))
        .as[(Long, Long)].head()
      val wallMs = (System.nanoTime() - t0) / 1000000
      Seq(StageMetric(stage, b, rows, bytes, wallMs, lineage,
        System.currentTimeMillis())).toDF()
        .write.mode(SaveMode.Append).parquet(metricsPath(root))
    }
    val available = completedBuckets(spark, root, stage)
    val paths = available.toSeq.sorted.map(b => s"$root/$stage/bucket=$b")
    if (paths.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(paths: _*)
  }

  /** Checkpointed exact-dedup scan: duplicates per size-hash bucket.
    * Resumable mid-run; identical final result to the direct pipeline. */
  def checkpointedDuplicates(spark: SparkSession, files: DataFrame,
                             root: String, nBuckets: Int,
                             cfg: graft.exact.DedupConfig = graft.exact.DedupConfig(),
                             onlyBuckets: Option[Set[Int]] = None): DataFrame = {
    val lineage = s"exact:v1:minSize=${cfg.minSize}:prefixLen=${cfg.prefixLen}:" +
      s"nBuckets=$nBuckets"
    runStage(spark, root, "exact", nBuckets, lineage, onlyBuckets) { b =>
      // the bucket filter rides the scan (partition-prunable at Iceberg
      // scale); all downstream grouping keys contain `size`, so the bucket
      // is self-contained
      graft.exact.ExactDedup.duplicates(
        files.filter(pmod(col("size"), nBuckets) === b), cfg)
    }
  }

  /** Non-negative modulus (sizes are non-negative; kept explicit). */
  private def pmod(c: org.apache.spark.sql.Column, n: Int) = c % n
}
