package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative hash-min label propagation over
  * DataFrame joins — the clustering step of the near-dup tier (north_rule;
  * no GraphX/RDD per input_hint). Each vertex starts labeled with its own
  * id; every iteration each vertex takes the min label in its closed
  * neighborhood; converges in O(component diameter) rounds.
  *
  * Scale notes: labels monotonically decrease, so convergence is detected by
  * the (cheap, aggregate-only) sum of labels reaching a fixpoint.
  * `localCheckpoint` truncates plan lineage each round — without it the
  * iterated join tree grows exponentially and Catalyst analysis dominates.
  * Near-dup components are small (dup families), so rounds stay in single
  * digits; for adversarial long-chain graphs swap in large-star/small-star.
  */
object ConnectedComponents {

  /** @param vertices one column `file_id`
    * @param edges    two columns `a`, `b` (undirected, any orientation)
    * @return (file_id, cluster_id) — cluster_id = min file_id reachable
    */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = vertices.sparkSession
    var e = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .localCheckpoint(true)

    // size the iteration shuffles to the data: each round is 2 shuffles of
    // the (id, label) relation — at a few thousand edges, 32-way exchanges
    // are pure scheduler overhead; at billions, the caller's default
    // parallelism is right. ~1M edge-endpoints per partition.
    val nParts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism,
      (e.count() / 1000000L).toInt + 1))
    if (nParts < spark.sparkContext.defaultParallelism)
      e = e.repartition(nParts).localCheckpoint(true)

    // convergence check: labels decrease monotonically, so the label sum is
    // a strict fixpoint detector. Summed as decimal(38,0): a long sum would
    // overflow (and throw, under ANSI) at 10^12 vertices × 2^63-scale ids.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head()
        .getDecimal(0)

    var labels = vertices.select(col("file_id"), col("file_id").as("cluster_id"))
      .repartition(nParts)
      .localCheckpoint(true)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val propagated = e
        .join(labels.withColumnRenamed("file_id", "src"), Seq("src"))
        .select(col("dst").as("file_id"), col("cluster_id"))
      // pre-partition by the grouping key at nParts: HashPartitioning
      // satisfies the aggregation's required distribution, so the round
      // costs ONE exchange, not groupBy-shuffle + repartition
      val next = labels.union(propagated)
        .repartition(nParts, col("file_id"))
        .groupBy("file_id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint(true)
      val s = labelSum(next)
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    labels
  }
}
