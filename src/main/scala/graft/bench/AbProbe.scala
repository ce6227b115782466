package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** TEMPORARY job/stage accounting probe (round-6 measurement only): counts
  * Spark jobs, stages, tasks and per-job wall for one cold run of each heavy
  * operator, attributing fixed scheduling overhead. Deleted once recorded
  * in OPTIMIZATION_r06.md. */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = graft.Tables.corpus(spark, sfDir)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var jobWallMs = 0L
    val stageLog = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Int, String)]())
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1; jobStart.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.remove(j.jobId)
        if (t0 != 0L) jobWallMs += (System.nanoTime() - t0) / 1000000
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
        val ms = (for {a <- s.stageInfo.completionTime; b <- s.stageInfo.submissionTime}
          yield a - b).getOrElse(0L)
        val tm = s.stageInfo.taskMetrics
        val run = if (tm == null) 0L else tm.executorRunTime
        val gc = if (tm == null) 0L else tm.jvmGCTime
        val deser = if (tm == null) 0L else tm.executorDeserializeTime
        stageLog.add((ms, s.stageInfo.numTasks,
          f"run=${run}ms gc=${gc}ms deser=${deser}ms " +
            s.stageInfo.name.takeWhile(_ != '\n').take(60)))
      }
    })

    def run(name: String)(f: => Long): Unit = {
      graft.util.Blocks.sweep(spark)
      Thread.sleep(500) // let listener drain
      jobs = 0; stages = 0; tasks = 0; jobWallMs = 0L; stageLog.clear()
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[jobs] $name%-20s wall=$wall%6.2f s jobs=$jobs%4d stages=$stages%4d " +
        f"tasks=$tasks%6d jobwall=${jobWallMs / 1000.0}%6.2f s rows=$n")
      import scala.jdk.CollectionConverters._
      stageLog.asScala.toSeq.sortBy(-_._1).take(12).foreach { case (ms, nt, nm) =>
        println(f"[stage] $ms%6d ms tasks=$nt%4d  $nm")
      }
    }

    // warmup
    graft.near.NearDup.clusters(corpus).count()
    run("verified_pairs") { graft.near.NearDup.verifiedPairs(corpus).count() }
    run("clusters") { graft.near.NearDup.clusters(corpus).count() }
    run("all_clusters") { graft.near.NearDup.allFileClusters(corpus).count() }
    run("duplicates") { graft.exact.ExactDedup.duplicates(corpus).count() }
    run("uniques") { graft.exact.ExactDedup.uniques(corpus).count() }
    run("stats") { graft.exact.ExactDedup.stats(corpus).count() }
    spark.stop()
  }
}
