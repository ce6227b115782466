package graft

import org.apache.spark.sql.functions._
import graft.near.{NearConfig, NearDup}
import graft.model.Fixtures

/** FIXTURES.md near-dup mutation plan: expected pair set computed
  * analytically from the mutation types → recall ≥ 0.99; threshold-crossing
  * truncations must NOT pair; vendored exact copies collapse pre-tier. */
class NearDupMutationSpec extends SparkSpec {
  private val cfg = NearConfig()
  private lazy val corpus = Fixtures.nearDupCorpus(spark).cache()
  private lazy val found = NearDup.verifiedPairs(corpus, cfg)
    .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("whitespace edits and identifier renames pair with their base (recall)") {
    val expected = corpus.filter(col("file_id") >= 10000 && col("file_id") < 30000)
      .select("file_id").collect()
      .map(_.getLong(0)).map(m => (m % 10000, m)).toSet
    val hit = expected.count(found.contains)
    val recall = hit.toDouble / expected.size
    assert(expected.nonEmpty && recall >= 0.99,
      s"recall=$recall ($hit/${expected.size}); missing=${expected.filterNot(found.contains).take(3)}")
  }

  test("50% truncations never pair with their base (precision)") {
    val badPairs = corpus.filter(col("file_id") >= 30000 && col("file_id") < 40000)
      .select("file_id").collect()
      .map(_.getLong(0)).map(m => (m % 10000, m)).toSet
    assert(badPairs.nonEmpty)
    assert(badPairs.count(found.contains) == 0)
  }

  test("vendored exact copies collapse to the base representative pre-tier") {
    val reps = NearDup.representatives(corpus, cfg)
      .select("file_id").collect().map(_.getLong(0)).toSet
    // every vend_N (id+40000) must NOT be a representative (its base is)
    assert(!reps.exists(id => id >= 40000 && id < 50000))
  }

  test("clusters put base+ws+ren+vendored together, truncations apart") {
    val clusters = NearDup.allFileClusters(corpus, cfg)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    clusters.keys.filter(id => id >= 10000 && id < 30000).foreach { m =>
      assert(clusters(m) == clusters(m % 10000), s"mutant $m split from base")
    }
    clusters.keys.filter(id => id >= 40000).foreach { m =>
      assert(clusters(m) == clusters(m % 10000), s"vendored $m split from base")
    }
    clusters.keys.filter(id => id >= 30000 && id < 40000).foreach { m =>
      assert(clusters(m) != clusters(m % 10000), s"truncation $m merged with base")
    }
  }
}
