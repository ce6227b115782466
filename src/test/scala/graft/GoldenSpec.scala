package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.exact.{DedupConfig, ExactDedup}
import graft.model.Fixtures

/** Golden scenario replays of the reference's test trees (SURVEY.md §5,
  * FIXTURES.md): each fixture reproduces a tests/files* shape and the
  * asserted sets mirror the transcribed output.NN semantics. */
class GoldenSpec extends SparkSpec {

  private def setsOf(files: DataFrame,
                     cfg: DedupConfig = DedupConfig()): Set[Set[String]] =
    ExactDedup.duplicates(files, cfg)
      .groupBy("size", "hash").agg(collect_list("path").as("paths"))
      .collect().map(_.getSeq[String](2).toSet).toSet

  test("files: dup sets of 2-4, same-size foils split, uniques never grouped") {
    val f = Fixtures.files(spark)
    val sets = setsOf(f)
    // the many/ma.* family is one 8-member set
    assert(sets.exists(s => s.size == 8 && s.forall(_.startsWith("many/"))))
    // small pair found
    assert(sets.contains(Set("small1", "small2")))
    // file3not1/file3not2 share size with file3's set but differ -> never together
    assert(!sets.exists(s => s.contains("file3not1") && s.contains("file3not2")))
    assert(!sets.exists(s => s.contains("file3not1") && s.exists(_.startsWith("file3"))
      && s.size > 1 && s.contains("file3")))
    // every fileN set contains fileN and only its copies
    (1 to 6).foreach { n =>
      val expect = sets.find(_.contains(s"file$n"))
      assert(expect.isDefined, s"file$n set missing")
      assert(expect.get.forall(p => p == s"file$n" || p.startsWith(s"file${n}copy")))
    }
    // lonely files in no set
    assert(!sets.exists(s => s.exists(_.startsWith("lonely"))))
  }

  test("files2: hidden files excluded by default, included with --hidden") {
    val f = Fixtures.files2(spark)
    val defaultSets = setsOf(f)
    assert(defaultSets == Set(Set("path1/hello1", "path2/hello1")))
    val withHidden = setsOf(f, DedupConfig(includeHidden = true))
    assert(withHidden == Set(Set("path1/hello1", "path2/hello1", ".path3/hello1")))
  }

  test("files2: unique-size file is pruned before hashing") {
    val f = Fixtures.files2(spark)
    val survivors = ExactDedup.sizeSurvivors(f, DedupConfig())
      .select("path").collect().map(_.getString(0)).toSet
    assert(!survivors.contains("lonely/unique_size"))
  }

  test("files4: full hash splits what size + partial hash kept together") {
    val f = Fixtures.files4(spark)
    val sets = setsOf(f)
    assert(sets.contains(Set("1", "3")))
    assert(sets.contains(Set("z1", "z2")))
    assert(!sets.exists(_.contains("2")))   // same size+prefix as 1/3, split by full hash
    assert(!sets.exists(_.contains("z")))
    assert(!sets.exists(s => s.exists(_.startsWith("F"))))
    // and "2" reached the full-hash stage (survived size + partial hash)
    val hashed = ExactDedup.hashedSurvivors(f, DedupConfig())
      .select("path").collect().map(_.getString(0)).toSet
    assert(hashed.contains("2"))
  }

  test("files7: hardlink-is-unique collapses links; content-equal file remains dup") {
    val f = Fixtures.files7(spark)
    // default: hardlinks ARE duplicates (docs/design.md:31-48)
    val defaultSets = setsOf(f)
    assert(defaultSets.exists(s => s == Set("link1", "link1")
      || (s.size == 1 && s.contains("link1")) || s.size == 2))
    // with the policy: one physical instance per (path, hash)
    val unique = ExactDedup.hardlinkUnique(f, DedupConfig())
    assert(unique.count() == 3) // link1, link2, indep
    // re-running dedup on the collapsed set: link2's survivor + indep are
    // still content-equal -> remain a duplicate pair
    val collapsed = f.join(unique.select("file_id"), Seq("file_id"), "left_semi")
    val sets2 = setsOf(collapsed)
    assert(sets2 == Set(Set("link2", "indep")))
  }

  test("files8: unreadable (null content) members degrade survivors to UNIQUE") {
    val f = Fixtures.files8(spark)
    val sets = setsOf(f)
    assert(sets == Set(Set("s1", "s2"))) // r1's only partner was unreadable
    val uniques = ExactDedup.uniques(f, DedupConfig())
      .select("path").collect().map(_.getString(0)).toSet
    assert(uniques.contains("r1"))
    assert(!uniques.contains("r2")) // null content: not scanned at all
  }

  test("files6/refresh: deleting members shrinks or drops sets") {
    val f = Fixtures.files(spark)
    val scanned = ExactDedup.duplicates(f, DedupConfig())
    // delete all many/* except two members
    val snapshot = f.filter(!col("path").startsWith("many/") ||
      col("path").isin("many/ma.1", "many/ma.2"))
    val refreshed = ExactDedup.refresh(scanned, snapshot)
    val manySet = refreshed.filter(col("path").startsWith("many/"))
      .select("path").collect().map(_.getString(0)).toSet
    assert(manySet == Set("many/ma.1", "many/ma.2"))
    // delete one of small1/small2 -> set vanishes
    val snapshot2 = f.filter(col("path") =!= "small2")
    val refreshed2 = ExactDedup.refresh(scanned, snapshot2)
    assert(refreshed2.filter(col("path").startsWith("small")).count() == 0)
  }
}
