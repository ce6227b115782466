package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.exact.{DedupConfig, ExactDedup}
import graft.near.{NearConfig, NearDup}
import graft.query.Report

/** spark-submit entry mirroring the reference CLI's operations
  * (/root/reference/src/options.conf, src/main.c:558-583):
  *
  *   graft.cli.Main <op> --data <sfDir> [flags]
  *
  *   scan      write duplicates to --out (parquet), like `dupd scan`
  *   report    text/csv/json report (--format, --cut, --minsize)
  *   uniques | dups | ls    file classification listings
  *   file      one file's dup set (--id N)
  *   refresh   drop vanished members (--drop-repo simulates deletions)
  *   validate  exit 1 if any set's members diverge (src/report.c:607-679)
  *   rmsh      rm-shell script on stdout
  *   near      near-dup verified pairs to --out
  *   clusters  near-dup clusters to --out
  *   hash      per-row sha256 of one file (--id N)
  *
  * Flags: --minsize N (F2/F7), --cut PREFIX (C8), --format text|csv|json,
  * --hidden (F1), --out DIR, --checkpoint DIR --buckets N (resumable scan).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val op = args.headOption.getOrElse("help")
    // one-token boolean flags vs two-token valued flags: consume accordingly
    // (sliding(2,2) misaligned everything after a bare --hidden)
    val booleanFlags = Set("hidden")
    val opts = {
      val m = scala.collection.mutable.Map.empty[String, String]
      var i = 1
      while (i < args.length) {
        val a = args(i)
        if (a.startsWith("--")) {
          val k = a.drop(2)
          if (booleanFlags(k)) { m(k) = "true"; i += 1 }
          else if (i + 1 < args.length) { m(k) = args(i + 1); i += 2 }
          else i += 1 // trailing valued flag with no value: ignore
        } else i += 1
      }
      m.toMap
    }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName(s"graft-$op")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dataDir = opts.getOrElse("data", "/root/testdata/sf0.001")
    val cfg = DedupConfig(
      minSize = opts.get("minsize").map(_.toLong).getOrElse(1L),
      includeHidden = opts.contains("hidden"))
    val cutP = opts.get("cut")
    def corpus = Tables.corpus(spark, dataDir)
    def dupsDf = opts.get("checkpoint") match {
      case Some(root) => graft.state.Checkpoints.checkpointedDuplicates(
        spark, corpus, root, opts.getOrElse("buckets", "8").toInt, cfg)
      case None => ExactDedup.duplicates(corpus, cfg)
    }
    def sets(minTotal: Long = 0L) = Report.reportSets(dupsDf, cutP, minTotal)

    val exitCode: Int = op match {
      case "scan" =>
        val out = opts.getOrElse("out", "/tmp/graft_duplicates")
        dupsDf.write.mode("overwrite").parquet(out)
        println(s"duplicates written to $out"); 0
      case "report" =>
        val s = sets(opts.get("minsize").map(_.toLong).getOrElse(0L))
        opts.getOrElse("format", "text") match {
          case "csv" => Report.csv(s).foreach(println)
          case "json" => println(Report.json(s))
          case _ => Report.text(s).foreach(println)
        }
        0
      case "uniques" =>
        ExactDedup.uniques(corpus, cfg).orderBy("file_id")
          .collect().foreach(r => println(s"   UNIQUE: ${r.get(1)}/${r.get(2)}")); 0
      case "dups" | "ls" =>
        ExactDedup.dups(corpus, cfg).orderBy("file_id")
          .collect().foreach(r => println(s"DUPLICATE: ${r.get(1)}/${r.get(2)}")); 0
      case "file" =>
        val id = opts.getOrElse("id", "0").toLong
        ExactDedup.fileLookup(corpus, id, cfg).orderBy("file_id")
          .collect().foreach(r =>
            println(f"${r.getString(3)}%8s: ${r.get(1)}/${r.get(2)}")); 0
      case "refresh" =>
        val snapshot = opts.get("drop-repo")
          .fold(corpus)(rm => corpus.filter(col("repo") =!= rm))
        val refreshed = ExactDedup.refresh(dupsDf, snapshot)
        val out = opts.getOrElse("out", "/tmp/graft_duplicates_refreshed")
        refreshed.write.mode("overwrite").parquet(out)
        println(s"refreshed duplicates written to $out"); 0
      case "validate" =>
        val bad = ExactDedup.validate(corpus, cfg).count()
        println(if (bad == 0) "validate: OK" else s"validate: $bad sets diverged")
        if (bad == 0) 0 else 1
      case "rmsh" =>
        Report.rmShell(sets()).foreach(println); 0
      case "near" =>
        val out = opts.getOrElse("out", "/tmp/graft_neardup_pairs")
        NearDup.verifiedPairs(corpus, NearConfig()).write.mode("overwrite").parquet(out)
        println(s"near-dup pairs written to $out"); 0
      case "clusters" =>
        val out = opts.getOrElse("out", "/tmp/graft_clusters")
        NearDup.allFileClusters(corpus, NearConfig()).write.mode("overwrite").parquet(out)
        println(s"clusters written to $out"); 0
      case "hash" =>
        val id = opts.getOrElse("id", "0").toLong
        corpus.filter(col("file_id") === id)
          .select(sha2(col("content"), 256)).collect()
          .foreach(r => println(r.getString(0))); 0
      case _ =>
        println("usage: graft.cli.Main <scan|report|uniques|dups|ls|file|" +
          "refresh|validate|rmsh|near|clusters|hash> --data DIR [flags]"); 2
    }
    spark.stop()
    if (exitCode != 0) sys.exit(exitCode)
  }
}
