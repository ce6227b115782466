package graft

import graft.exact.{DedupConfig, ExactDedup}
import graft.query.Report
import graft.query.Report.RmshLink

/** Report-sink formats per the reference goldens (FIXTURES.md "Report
  * goldens"; /root/reference/src/report.c:288-386,549-600, link modes
  * mirroring tests/test.26-28). Renderers stream (Iterator[String]); specs
  * materialize with .toSeq. */
class ReportSpec extends SparkSpec {
  private lazy val sets =
    Report.reportSets(ExactDedup.duplicates(Tables.corpus(spark, sf),
      DedupConfig())).cache()

  test("text: header lines + indented members + Total used footer") {
    val lines = Report.text(sets).toSeq
    assert(lines.last.startsWith("Total used: "))
    assert(lines.last.matches(
      raw"Total used: \d+ bytes \(\d+\.\d\d KiB, \d+\.\d\d MiB, \d+\.\d\d GiB\)"))
    // the streamed footer must equal the relation-side aggregate
    assert(lines.last == Report.footer(Report.totalUsed(sets)))
    val headers = lines.filter(_.matches(raw"\d+ total bytes used by duplicates of size \d+:"))
    assert(headers.nonEmpty && headers.size.toLong == sets.count())
    assert(lines.count(_.startsWith("  ")) ==
      sets.selectExpr("size(paths)").collect().map(_.getInt(0)).sum)
  }

  test("text: ascending by total (worst offenders last)") {
    val totals = Report.text(sets).toSeq
      .filter(_.contains(" total bytes used by "))
      .map(_.split(" ")(0).toLong)
    assert(totals == totals.sorted)
  }

  test("csv: one line per set, quotes escaped") {
    val lines = Report.csv(sets).toSeq
    assert(lines.size.toLong == sets.count())
    val csvRe = "\\d+,\\d+,(\"[^\"]*\",?)+"
    assert(lines.forall(_.matches(csvRe)))
  }

  test("json: streams as a top-level array of arrays") {
    val lines = Report.json(sets).toSeq
    assert(lines.head == "[" && lines.last == "]")
    val rows = lines.filter(_.startsWith("[ "))
    assert(rows.length.toLong == sets.count())
    // every row but the last is comma-terminated; the last is not
    assert(rows.init.forall(_.endsWith("],")) && rows.last.endsWith("]"))
  }

  test("rmsh: warning header + keeps exactly one member per set") {
    val script = Report.rmShell(sets).toSeq
    assert(script.head == "#!/bin/sh")
    // the reference's auto-generated warning banner (report.c:563-567)
    assert(script(1) == "#" &&
      script(2).startsWith("# WARNING: Auto-generated") &&
      script(5) == "#")
    val keeps = script.count(_.startsWith("# KEEPING: "))
    val rms = script.count(_.startsWith("rm \""))
    assert(keeps.toLong == sets.count())
    assert(rms ==
      sets.selectExpr("size(paths)").collect().map(_.getInt(0)).sum - keeps)
    assert(!script.exists(_.startsWith("ln ")))
  }

  test("rmsh --link / --hardlink: one ln per rm, pointing at the kept member") {
    for ((mode, lnPrefix) <- Seq(RmshLink.Soft -> "ln -s \"",
                                 RmshLink.Hard -> "ln \"")) {
      val script = Report.rmShell(sets, mode).toSeq
      val rms = script.count(_.startsWith("rm \""))
      val lns = script.filter(_.startsWith(lnPrefix))
      assert(lns.size == rms, s"mode $mode: ${lns.size} ln vs $rms rm")
      // each ln immediately follows its rm and links kept -> removed path
      script.sliding(2).foreach {
        case Seq(rm, ln) if rm.startsWith("rm \"") =>
          assert(ln.startsWith(lnPrefix))
          assert(ln.endsWith(rm.drop(3)), s"ln target != removed path: $ln / $rm")
        case _ => ()
      }
      // every kept banner path appears as the ln source
      val keeps = script.filter(_.startsWith("# KEEPING: ")).map(_.drop(11))
      assert(keeps.forall(k => script.exists(_.startsWith(lnPrefix.dropRight(1) + "\"" + k))))
    }
  }

  test("cut strips the configured prefix") {
    val cutSets = Report.reportSets(
      ExactDedup.duplicates(Tables.corpus(spark, sf), DedupConfig()),
      cutPrefix = Some("src"))
    val anyPath = cutSets.selectExpr("paths[0]").collect().map(_.getString(0))
    assert(anyPath.forall(!_.startsWith("src")))
  }

  test("minTotal filters small sets (F7)") {
    val filtered = Report.reportSets(
      ExactDedup.duplicates(Tables.corpus(spark, sf), DedupConfig()),
      minTotal = 600L)
    assert(filtered.filter(org.apache.spark.sql.functions.col("total") < 600).count() == 0)
  }
}
