package graft.query

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The reference's report sinks (S7/S8, /root/reference/src/report.c):
  * text / CSV / JSON renderings of the duplicates relation, with the
  * `--cut` prefix strip, report-side min-size filter (F7), ascending
  * total order (O1) and the `Total used:` footer
  * (/root/reference/src/report.c:288-386), plus the rm-shell script sink
  * (/root/reference/src/report.c:549-600).
  *
  * Renderers take the SET-level relation (each_size, set_size, members,
  * paths) and emit strings; at scale the per-set rows stream through
  * mapPartitions-free column expressions and only the final footer is an
  * aggregate.
  */
object Report {

  /** dupd's `--cut` prefix strip (/root/reference/src/report.c:77-86). */
  def cut(path: org.apache.spark.sql.Column, prefix: Option[String]) =
    prefix.fold(path)(p => regexp_replace(path, "^" + java.util.regex.Pattern.quote(p), ""))

  /** Set-level report rows with member path arrays, from the flat
    * duplicates relation (file_id, repo, path, size, hash, set_size). */
  def reportSets(duplicates: DataFrame, cutPrefix: Option[String] = None,
                 minTotal: Long = 0L): DataFrame =
    duplicates
      .withColumn("p", cut(concat(col("repo"), lit("/"), col("path")), cutPrefix))
      .groupBy(col("size").as("each_size"), col("hash"))
      .agg(count(lit(1)).as("set_size"), sort_array(collect_list(col("p"))).as("paths"))
      .withColumn("total", col("each_size") * col("set_size"))
      .filter(col("total") >= minTotal)            // F7
      .orderBy(col("total"), col("hash"))          // O1

  /** Human footer numbers (text report, src/report.c:371-378). */
  def totalUsed(sets: DataFrame): Long =
    sets.agg(coalesce(sum("total"), lit(0L))).head().getLong(0)

  def footer(total: Long): String = {
    val kib = total / 1024.0
    val mib = kib / 1024.0
    val gib = mib / 1024.0
    f"Total used: $total bytes ($kib%.2f KiB, $mib%.2f MiB, $gib%.2f GiB)"
  }

  /** Text format: header per set + two-space-indented members
    * (src/report.c:332-369). Returns the report lines in order. */
  def text(sets: DataFrame): Seq[String] = {
    val rows = sets.select("total", "each_size", "paths").collect()
    val body = rows.flatMap { r =>
      val total = r.getLong(0); val each = r.getLong(1)
      val paths = r.getSeq[String](2)
      s"$total total bytes used by duplicates of size $each:" +:
        paths.map("  " + _)
    }
    body.toSeq :+ footer(rows.map(_.getLong(0)).sum)
  }

  /** CSV format: total,each_size,"p1","p2",... with `""` escaping
    * (src/report.c:55-64,304-306). */
  def csv(sets: DataFrame): Seq[String] =
    sets.select("total", "each_size", "paths").collect().map { r =>
      val quoted = r.getSeq[String](2)
        .map(p => "\"" + p.replace("\"", "\"\"") + "\"")
      (Seq(r.getLong(0).toString, r.getLong(1).toString) ++ quoted).mkString(",")
    }.toSeq

  /** JSON format: [ total, each_size, "p1", ... ] per set in one array
    * (src/report.c:88-100,340-343). */
  def json(sets: DataFrame): String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val rows = sets.select("total", "each_size", "paths").collect().map { r =>
      val parts = Seq(r.getLong(0).toString, r.getLong(1).toString) ++
        r.getSeq[String](2).map(q)
      parts.mkString("[ ", ", ", " ]")
    }
    rows.mkString("[\n", ",\n", "\n]")
  }

  /** rm-shell sink (S8): keep the first member of each set, `rm` the rest —
    * one script line per removal (src/report.c:549-600). */
  def rmShell(sets: DataFrame): Seq[String] = {
    val rows = sets.select("paths").collect()
    ("#!/bin/sh" +: rows.flatMap { r =>
      val paths = r.getSeq[String](0)
      s"# keeping: ${paths.head}" +: paths.tail.map(p => s"rm '${p.replace("'", "'\\''")}'")
    }).toSeq
  }
}
