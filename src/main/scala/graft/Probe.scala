package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val corpus = Tables.corpus(spark, sfDir)
    // exact-dedup throughput at amortizing scale (×16 ≈ 143k files)
    val big = bench.Scaling.expand(corpus.repartition(64), 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBig = big.count()
    t(s"exact_dedup_x64 (n=$nBig)") { exact.ExactDedup.duplicates(big).count() }
    t(s"exact_dedup_x64 warm") { exact.ExactDedup.duplicates(big).count() }
    big.unpersist()
    import graft.near.{NearConfig, NearDup}
    val cfg = NearConfig()
    // pipeline stage breakdown (each timed cold)
    t("reps") { NearDup.representatives(corpus, cfg).count() }
    t("signatures") {
      val reps = NearDup.representatives(corpus, cfg)
      NearDup.fastSignatures(reps, cfg).count()
    }
    t("lsh_pairs") { NearDup.lshPairs(corpus, cfg).count() }
    t("simhash_pairs") { NearDup.simhashPairs(corpus, cfg).count() }
    t("verified_pairs") { NearDup.verifiedPairs(corpus, cfg).count() }
    t("neardup_clusters") { NearDup.clusters(corpus).count() }
    t("all_clusters") { NearDup.allFileClusters(corpus).count() }
    spark.stop()
  }
}
