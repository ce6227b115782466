package graft

import graft.exact.{DedupConfig, ExactDedup}
import graft.query.Report

/** Report-sink formats per the reference goldens (FIXTURES.md "Report
  * goldens"; /root/reference/src/report.c:288-386,549-600). */
class ReportSpec extends SparkSpec {
  private lazy val sets =
    Report.reportSets(ExactDedup.duplicates(Tables.corpus(spark, sf),
      DedupConfig())).cache()

  test("text: header lines + indented members + Total used footer") {
    val lines = Report.text(sets)
    assert(lines.last.startsWith("Total used: "))
    assert(lines.last.matches(
      raw"Total used: \d+ bytes \(\d+\.\d\d KiB, \d+\.\d\d MiB, \d+\.\d\d GiB\)"))
    val headers = lines.filter(_.matches(raw"\d+ total bytes used by duplicates of size \d+:"))
    assert(headers.nonEmpty && headers.size.toLong == sets.count())
    assert(lines.count(_.startsWith("  ")) ==
      sets.selectExpr("size(paths)").collect().map(_.getInt(0)).sum)
  }

  test("text: ascending by total (worst offenders last)") {
    val totals = Report.text(sets)
      .filter(_.contains(" total bytes used by "))
      .map(_.split(" ")(0).toLong)
    assert(totals == totals.sorted)
  }

  test("csv: one line per set, quotes escaped") {
    val lines = Report.csv(sets)
    assert(lines.size.toLong == sets.count())
    val csvRe = "\\d+,\\d+,(\"[^\"]*\",?)+"
    assert(lines.forall(_.matches(csvRe)))
  }

  test("json: parses as a top-level array of arrays") {
    val j = Report.json(sets)
    assert(j.startsWith("[") && j.endsWith("]"))
    // minimal structural check: every set row starts with [ total, each_size
    val rows = j.split("\n").filter(_.startsWith("[ "))
    assert(rows.length.toLong == sets.count())
  }

  test("rmsh: keeps exactly one member per set") {
    val script = Report.rmShell(sets)
    assert(script.head == "#!/bin/sh")
    val keeps = script.count(_.startsWith("# keeping: "))
    val rms = script.count(_.startsWith("rm '"))
    assert(keeps.toLong == sets.count())
    assert(rms ==
      sets.selectExpr("size(paths)").collect().map(_.getInt(0)).sum - keeps)
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
