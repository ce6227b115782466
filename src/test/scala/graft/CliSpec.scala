package graft

import graft.cli.Main

/** End-to-end CLI drives through [[Main.runOp]] (session-neutral dispatch)
  * with captured stdout — the Spark analogue of the reference's shell test
  * matrix (tests/test.08-17 exclude/cut listing variants, tests/test.26-28
  * rmsh): `--cut`/`--exclude-path` on uniques/dups/ls, `hash --path`,
  * `cmp-two`, and the report/rmsh renderers driven from the flat relation. */
class CliSpec extends SparkSpec {

  private def run(args: String*): (Int, Seq[String]) = {
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Main.runOp(spark, args.head, Main.parseOpts(args.toArray))
    }
    (code, out.toString("UTF-8").split("\n").toSeq.filter(_.nonEmpty))
  }

  private val data = Seq("--data", sf)

  test("uniques/dups respect --exclude-path: excluded partners do not count") {
    // doc 3 (÷3, not ÷9): its only partner is mirror/doc_3.txt — excluding
    // mirror/ must demote base doc_3 to UNIQUE (reference report.c:243-251)
    val (c0, dups0) = run(Seq("dups") ++ data: _*)
    assert(c0 == 0 && dups0.exists(_.endsWith(" src3/doc_3.txt")))
    val (c1, dups1) = run(Seq("dups", "--exclude-path", "mirror/") ++ data: _*)
    assert(c1 == 0)
    assert(!dups1.exists(_.contains("src3/doc_3.txt")))
    // doc 9 (÷9): partners in mirror AND mirror2 — excluding mirror/ leaves
    // the mirror2 partner, so base doc_9 stays DUPLICATE...
    assert(dups1.exists(_.endsWith(" src9/doc_9.txt")))
    // ...and the EXCLUDED mirror file itself still lists as DUPLICATE (its
    // non-excluded partners count; the file is not exempted by the prefix)
    assert(dups1.exists(_.endsWith(" mirror/doc_9.txt")))
    // uniques is the complement: gains doc_3, never doc_9
    val (c2, uniq1) = run(Seq("uniques", "--exclude-path", "mirror/") ++ data: _*)
    assert(c2 == 0)
    assert(uniq1.exists(_.endsWith(" src3/doc_3.txt")))
    assert(!uniq1.exists(_.contains("src9/doc_9.txt")))
  }

  test("ls respects --exclude-path and --cut") {
    val (c, ls) = run(Seq("ls", "--exclude-path", "mirror/",
      "--cut", "src3/") ++ data: _*)
    assert(c == 0)
    val byPath = ls.map { l =>
      val Array(st, p) = l.split(": ", 2); (p, st.trim)
    }.toMap
    // cut strips the src3/ prefix from printed paths
    assert(byPath.contains("doc_3.txt") && !byPath.contains("src3/doc_3.txt"))
    assert(byPath("doc_3.txt") == "UNIQUE")          // partner excluded
    assert(byPath("src9/doc_9.txt") == "DUPLICATE")  // mirror2 partner remains
    assert(byPath("mirror2/doc_9.txt") == "DUPLICATE")
  }

  test("hash --path equals hash --id, and matches sha256 of the content") {
    val (ci, byId) = run(Seq("hash", "--id", "0") ++ data: _*)
    val (cp, byPath) = run(Seq("hash", "--path", "src0/doc_0.txt") ++ data: _*)
    assert(ci == 0 && cp == 0 && byId == byPath)
    val content = Tables.corpus(spark, sf)
      .filter(org.apache.spark.sql.functions.col("file_id") === 0L)
      .select("content").head().getString(0)
    val expect = java.security.MessageDigest.getInstance("SHA-256")
      .digest(content.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(byId.head == expect)
    // missing path: exit 1
    assert(run(Seq("hash", "--path", "src0/nope.txt") ++ data: _*)._1 == 1)
  }

  test("cmp-two: identical exits 0, different exits 1, paths resolve") {
    // doc 0 (÷3) is mirrored verbatim as file_id 1000000
    val (cEq, outEq) = run(Seq("cmp-two", "--id-a", "0",
      "--id-b", "1000000") ++ data: _*)
    assert(cEq == 0 && outEq.exists(_.contains("identical")))
    val (cNe, outNe) = run(Seq("cmp-two", "--path-a", "src0/doc_0.txt",
      "--path-b", "src1/doc_1.txt") ++ data: _*)
    assert(cNe == 1 && outNe.exists(_.contains("differ")))
    assert(run(Seq("cmp-two", "--id-a", "0") ++ data: _*)._1 == 2)
  }

  test("report text/csv and rmsh render from the flat relation") {
    val (cT, text) = run(Seq("report") ++ data: _*)
    assert(cT == 0 && text.last.startsWith("Total used: "))
    val (cC, csv) = run(Seq("report", "--format", "csv") ++ data: _*)
    assert(cC == 0 && csv.forall(_.matches("\\d+,\\d+,.*")))
    val (cR, rmsh) = run(Seq("rmsh", "--link", "--cut", "src") ++ data: _*)
    assert(cR == 0 && rmsh.head == "#!/bin/sh")
    assert(rmsh.count(_.startsWith("rm '")) ==
      rmsh.count(_.startsWith("ln -s '")))
  }
}
