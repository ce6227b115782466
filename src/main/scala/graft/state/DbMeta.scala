package graft.state

import org.apache.spark.sql.SparkSession

/** The scan db's run-metadata table — the analogue of dupd's `meta`
  * (version/dbtime/hidden, /root/reference/src/dbops.c:110-116) with the
  * read-back checks of open_database (/root/reference/src/dbops.c:244-293):
  * hard error on version mismatch, staleness warning past 3 days
  * (db_warn_age_seconds, /root/reference/src/main.c:88). */
object DbMeta {

  val Version = "graft-1"
  val StaleAfterMs: Long = 3L * 24 * 3600 * 1000

  final case class Meta(version: String, dbtime: Long, minsize: Long,
                        hidden: Boolean, alg: String)

  def write(spark: SparkSession, dir: String, cfg: graft.exact.DedupConfig,
            dbtime: Long = System.currentTimeMillis()): Unit = {
    import spark.implicits._
    Seq(Meta(Version, dbtime, cfg.minSize, cfg.includeHidden, cfg.hashAlg))
      .toDF().write.mode("overwrite").parquet(s"$dir/_meta")
  }

  def read(spark: SparkSession, dir: String): Option[Meta] =
    try {
      import spark.implicits._
      spark.read.parquet(s"$dir/_meta").as[Meta].collect().headOption
    } catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Open-time checks; returns warnings (staleness / missing meta), throws
    * on a version the reader does not understand. */
  def check(spark: SparkSession, dir: String,
            now: Long = System.currentTimeMillis()): Seq[String] =
    read(spark, dir) match {
      case None => Seq(s"no meta table at $dir — db written by an old scan?")
      case Some(m) =>
        if (m.version != Version)
          sys.error(s"db at $dir has version ${m.version}, expected $Version — re-run scan")
        val age = now - m.dbtime
        if (age > StaleAfterMs)
          Seq(s"db is ${age / 86400000L} days old; results may not reflect " +
            "the current data (re-run scan)")
        else Nil
    }
}
