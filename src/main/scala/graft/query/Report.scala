package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The reference's report sinks (S7/S8, /root/reference/src/report.c):
  * text / CSV / JSON renderings of the duplicates relation, with the
  * `--cut` prefix strip, report-side min-size filter (F7), ascending
  * total order (O1) and the `Total used:` footer
  * (/root/reference/src/report.c:288-386), plus the rm-shell script sink
  * with optional symlink/hardlink replacement
  * (/root/reference/src/report.c:549-600, options.conf:69-70).
  *
  * Renderers take the SET-level relation (each_size, set_size, members,
  * paths) and return `Iterator[String]` built on `toLocalIterator` — the
  * driver holds one partition of rendered sets at a time, never the whole
  * relation (dupd streams per set; a .collect() at 10^8 duplicate sets is a
  * driver OOM). Order is the relation's own orderBy (global sort = range
  * partitioning, so partition-ordered iteration is globally ordered);
  * footers accumulate during iteration and are appended lazily.
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

  private def setRows(sets: DataFrame) =
    sets.select("total", "each_size", "paths").toLocalIterator().asScala

  /** Text format: header per set + two-space-indented members
    * (src/report.c:332-369), streamed; the Total footer accumulates during
    * iteration (the `++` operand is by-name, so it is rendered only after
    * the body is exhausted). */
  def text(sets: DataFrame): Iterator[String] = {
    var total = 0L
    val body = setRows(sets).flatMap { r =>
      total += r.getLong(0)
      Iterator(s"${r.getLong(0)} total bytes used by duplicates of size ${r.getLong(1)}:") ++
        r.getSeq[String](2).iterator.map("  " + _)
    }
    body ++ Iterator.single(footer(total))
  }

  /** CSV format: total,each_size,"p1","p2",... with `""` escaping
    * (src/report.c:55-64,304-306), streamed. */
  def csv(sets: DataFrame): Iterator[String] =
    setRows(sets).map { r =>
      val quoted = r.getSeq[String](2)
        .map(p => "\"" + p.replace("\"", "\"\"") + "\"")
      (Seq(r.getLong(0).toString, r.getLong(1).toString) ++ quoted).mkString(",")
    }

  /** JSON format: [ total, each_size, "p1", ... ] per set in one top-level
    * array (src/report.c:88-100,340-343), streamed line by line (trailing
    * commas need one row of lookahead, not the whole result). */
  def json(sets: DataFrame): Iterator[String] = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val rows = setRows(sets).map { r =>
      (Seq(r.getLong(0).toString, r.getLong(1).toString) ++
        r.getSeq[String](2).map(q)).mkString("[ ", ", ", " ]")
    }
    val withCommas: Iterator[String] = new Iterator[String] {
      def hasNext: Boolean = rows.hasNext
      def next(): String = {
        val r = rows.next()
        if (rows.hasNext) r + "," else r
      }
    }
    Iterator.single("[") ++ withCommas ++ Iterator.single("]")
  }

  /** rm-shell replacement modes (dupd `rmsh --link` / `--hardlink`,
    * /root/reference/src/report.c:580-594, options.conf:69-70): after each
    * `rm`, re-create the removed path as a symlink / hardlink to the kept
    * member. */
  sealed trait RmshLink
  object RmshLink {
    case object NoLink extends RmshLink
    case object Soft extends RmshLink
    case object Hard extends RmshLink
  }

  /** rm-shell sink (S8): warning header, then per set a KEEPING banner and
    * one `rm` (plus optional `ln`) line per removed member — the reference's
    * script shape (/root/reference/src/report.c:563-594, tests/test.26-28).
    * Paths are double-quoted with shell metacharacters escaped. */
  def rmShell(sets: DataFrame, link: RmshLink = RmshLink.NoLink): Iterator[String] = {
    def dq(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case '$' => "\\$"; case '`' => "\\`"
      case c => c.toString
    } + "\""
    val header = Iterator(
      "#!/bin/sh",
      "#",
      "# WARNING: Auto-generated to blindly delete duplicates.",
      "# Only one file in each duplicate set is kept and it might not",
      "# be the one you wanted! Review carefully before running this!",
      "#",
      "")
    header ++ sets.select("paths").toLocalIterator().asScala.flatMap { r =>
      val paths = r.getSeq[String](0)
      val kept = paths.head
      Iterator("", "#", s"# KEEPING: $kept", "#") ++
        paths.tail.iterator.flatMap { p =>
          Iterator(s"rm ${dq(p)}") ++ (link match {
            case RmshLink.Soft => Iterator.single(s"ln -s ${dq(kept)} ${dq(p)}")
            case RmshLink.Hard => Iterator.single(s"ln ${dq(kept)} ${dq(p)}")
            case RmshLink.NoLink => Iterator.empty
          })
        }
    }
  }
}
