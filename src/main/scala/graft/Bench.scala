package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query timed at local[cpus] on
  * SPARK_GRAFT_SF_DIR. Extra headline fields: exact-dedup files/sec, and
  * (unless SPARK_GRAFT_SKIP_SCALING=1) the N→4N local-parallelism scaling
  * evidence required by the north rule.
  *
  * Output protocol (round-4 lesson — rc=124 during the scaling stage
  * destroyed ALL measurements because everything was one final println):
  * a COMPLETE JSON line is printed immediately after the query loop, and
  * again (superset, with throughput + scaling fields) at the end. The
  * artifact parser reads the tail, so the last line wins when the run
  * completes; if a later stage is killed, the early line still records the
  * round's per-query numbers. Every post-query stage also runs under a
  * wall-clock budget (SPARK_GRAFT_BENCH_BUDGET seconds, default 1200) so
  * the full run fits the driver's timeout with margin.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val benchT0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - benchT0) / 1e9
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "1200").toDouble
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE re-plans at runtime: skewed sort-merge join partitions are
      // split (north-rule skew handling for the exact tier's size joins)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      // default is 30 MIN — longer than the whole run; dead broadcast and
      // shuffle handles otherwise accumulate driver-side for the session
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one untimed warmup through the near-dup pipeline: the first timed
    // query otherwise absorbs ALL of the session's JIT + codegen warmup
    // (q_all_clusters, alphabetically first, measured 4x its steady-state)
    try { near.NearDup.clusters(Tables.corpus(spark, sfDir)).count() }
    catch { case _: Throwable => () }
    util.Blocks.sweep(spark)

    // deterministic order; caches cleared between reps so each is measured
    // cold and the persisted near-dup intermediates don't leak. Per-query
    // MIN-OF-N (default 3; queries over 30 s get 2 reps to bound wall-clock;
    // SPARK_GRAFT_BENCH_REPS overrides): this host is shared and co-tenant
    // load routinely exceeds 10 — single-shot timings jittered up to 4x
    // between otherwise-identical runs, min-of-N is the same protocol the
    // Scaling main already uses.
    val reps0 = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b — targeted A/B timing (local
    // iteration only; the driver always times the full surface)
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // Heavy queries (first rep > 30 s) normally get 2 reps to bound wall —
    // but on a shared host that makes the NOISIEST measurements the least
    // smoothed (round-5: a 17 s query recorded 59 s when both its reps hit
    // a co-tenant burst). A global stabilize budget funds one EXTRA rep for
    // any capped query whose two times disagree by > 30%.
    var stabilizeSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_STABILIZE", "240").toDouble
    // a query that errors on ANY rep is reported ONLY in `errors` — never
    // with a valid-looking time in `queries` (and a failed rep's elapsed
    // time never updates the min)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .flatMap { case (name, fn) =>
      var best = Double.MaxValue
      var worst = 0.0
      var rep = 0
      var reps = math.max(1, reps0)
      var errored = false
      while (rep < reps && !errored) {
        // full sweep, not just the SQL cache: composite operators leave
        // eager localCheckpoint blocks behind that catalog.clearCache()
        // cannot see — across 57 queries x 3 reps they filled the storage
        // pool and erratically degraded later queries 5-7x (round-5 find)
        util.Blocks.sweep(spark)
        val t0 = System.nanoTime()
        var ok = true
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          failed += name
          errored = true
          ok = false
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        val t = (System.nanoTime() - t0) / 1e9
        if (ok && t < best) best = t
        if (ok && t > worst) worst = t
        if (ok && rep == 0 && t > 30.0) reps = math.min(reps, 2)
        // disagreeing capped reps: buy one more from the stabilize budget
        if (ok && rep == 1 && reps == 2 && worst > best * 1.3 &&
            stabilizeSec > best) {
          reps = 3
          stabilizeSec -= best
          System.err.println(f"[bench] $name reps disagree " +
            f"($best%.1f/$worst%.1f s) — extra rep " +
            f"(${stabilizeSec}%.0f s stabilize budget left)")
        }
        rep += 1
      }
      if (errored) None else Some(name -> best)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val protocol = s"min-of-${sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3")}" +
      " per query (2 reps over 30s, +1 if those disagree >30%), " +
      "caches+checkpoint blocks swept + cleaner GC'd per rep"
    val head = f""""metric":"total","value":$total%.3f,"unit":"sec","protocol":"$protocol","queries":$qs,"errors":$errs,"sf":"$sfDir""""
    // FIRST emission: the per-query numbers are on stdout NOW — a timeout
    // in any later stage can no longer erase the round's measurements
    println("{" + head + ",\"stage\":\"queries\"}")
    System.out.flush()

    // headline: exact-dedup scan throughput (files/sec over the corpus).
    // The raw corpus number is fixed-overhead-bound (~10 Spark stages over
    // 9k files); the ×64 expansion (572k files, input materialized like a
    // cluster's already-landed table) measures the amortized rate.
    util.Blocks.sweep(spark)
    val corpus = Tables.corpus(spark, sfDir)
    val nFiles = corpus.count()
    val tScan0 = System.nanoTime()
    exact.ExactDedup.duplicates(corpus).count()
    val scanSec = (System.nanoTime() - tScan0) / 1e9
    util.Blocks.sweep(spark)
    val big = bench.Scaling.expand(corpus.repartition(64), 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBig = big.count()
    val tBig0 = System.nanoTime()
    exact.ExactDedup.duplicates(big).count()
    val bigSec = (System.nanoTime() - tBig0) / 1e9
    spark.stop()

    val thru = f""","n_files":$nFiles,"exact_scan_sec":$scanSec%.3f,""" +
      f""""exact_files_per_sec":${nFiles / scanSec}%.1f,"n_files_x64":$nBig,""" +
      f""""exact_x64_sec":$bigSec%.3f,"exact_files_per_sec_amortized":${nBig / bigSec}%.1f"""
    // SECOND emission: queries + throughput (scaling still pending)
    println("{" + head + thru + ",\"stage\":\"throughput\"}")
    System.out.flush()

    // scaling runs inside whatever wall-clock budget remains (at least one
    // N/4N session pair always runs, so a recorded artifact always carries
    // a scaling number unless explicitly skipped)
    val scalingBudget = budgetSec - elapsedSec
    val scaling =
      if (sys.env.get("SPARK_GRAFT_SKIP_SCALING").contains("1")) ""
      else try {
        "," + bench.Scaling.scalingReport(sfDir,
          n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "4").toInt,
          mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "8").toInt,
          budgetSec = scalingBudget)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] scaling failed: ${e.getMessage}")
        "" // never lose the round's query timings to a scaling hiccup
      }

    // FINAL emission: the complete superset line — the artifact tail ends
    // with this when the run finishes inside the driver's timeout
    println("{" + head + thru + scaling + f""","bench_wall_sec":$elapsedSec%.1f}""")
  }
}
