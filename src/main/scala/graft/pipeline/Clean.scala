package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.near.NearConfig
import graft.text.TextAnalysis

/** The canonical training-data cleaning pipeline, composed end to end from
  * the engine's tiers: quality gate → exact dedup (collapse identical
  * content) → near-dup clustering (MinHash-LSH + SimHash + sketch-prefiltered
  * Jaccard) → keep ONE representative document per near-dup cluster.
  * What a 100 TB pretraining-corpus pass actually runs; every stage is the
  * already-oracle-checked operator, so the composition is too.
  */
object Clean {

  /** Documents as the files shape the dedup tiers operate on. */
  def docsAsFiles(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("file_id"),
      lit("docs").as("repo"),
      concat(lit("d_"), col("doc_id")).as("path"),
      lit("c0").as("commit"),
      col("lang"),
      col("text").as("content"))
      .withColumn("size", length(col("content")).cast("long"))

  /** Kept documents: one per near-dup cluster among quality-passing docs.
    * Output (doc_id, n_merged) — the representative's id and how many
    * quality-passing documents its cluster absorbed.
    *
    * Documents too short to shingle (size < shingleK) cannot enter the
    * near-dup tier, but a cleaning pipeline must not LOSE them: they are
    * exact-deduplicated by (size, hash) and kept as their own clusters. */
  def keptDocs(documents: DataFrame, minQuality: Double = 0.82,
               cfg: NearConfig = NearConfig()): DataFrame =
    graft.util.PersistScope.scoped { s =>
    // the quality gate (3 regex passes + a token walk per doc) is computed
    // ONCE into a persisted frame feeding both branches below
    val qualified = documents
      .filter(TextAnalysis.qualityScore(col("text")) >= minQuality)
    val files = s.persist(docsAsFiles(qualified))
    val nearKept = graft.near.NearDup.allFileClusters(files, cfg)
      .groupBy("cluster_id")
      .agg(min("file_id").as("doc_id"), count(lit(1)).as("n_merged"))
      .select("doc_id", "n_merged")
    val shortKept = files.filter(col("size") < cfg.shingleK)
      .select(col("file_id"), col("size"), sha2(col("content"), 256).as("h"))
      .groupBy("size", "h")
      .agg(min("file_id").as("doc_id"), count(lit(1)).as("n_merged"))
      .select("doc_id", "n_merged")
    nearKept.unionAll(shortKept)
    }

  /** [[keptDocs]] with QUALITY-AWARE representative selection: the kept
    * document of each near-dup cluster is the highest-quality member
    * (ties → lowest doc_id), not the lowest id — what a real pretraining
    * pass wants (keep the cleanest copy of each boilerplate family).
    * Output (doc_id, n_merged, rep_quality); rep_quality is the synced
    * floor-scaled score, so the DuckDB oracle reproduces the argmax. */
  def keptDocsBest(documents: DataFrame, minQuality: Double = 0.82,
                   cfg: NearConfig = NearConfig()): DataFrame =
    graft.util.PersistScope.scoped { s =>
    // quality computed ONCE in a single projection (the score is 3 regex
    // passes + token walks per doc — a self-join of two recomputations
    // doubled this query's cost)
    val files = s.persist(documents
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .filter(col("q") >= minQuality)
      .select(
        col("doc_id").as("file_id"), lit("docs").as("repo"),
        concat(lit("d_"), col("doc_id")).as("path"), lit("c0").as("commit"),
        col("lang"), col("text").as("content"), col("q"))
      .withColumn("size", length(col("content")).cast("long")))
    def bestPerGroup(grouped: org.apache.spark.sql.RelationalGroupedDataset) =
      grouped.agg(
        max_by(col("file_id"), struct(col("q"), -col("file_id"))).as("doc_id"),
        count(lit(1)).as("n_merged"),
        max(col("q")).as("rep_quality"))
    val nearKept = bestPerGroup(
      graft.near.NearDup.allFileClusters(files.drop("q"), cfg)
        .join(files.select("file_id", "q"), Seq("file_id"))
        .groupBy("cluster_id"))
      .select("doc_id", "n_merged", "rep_quality")
    val shortKept = bestPerGroup(
      files.filter(col("size") < cfg.shingleK)
        .select(col("file_id"), col("q"), col("size"),
          sha2(col("content"), 256).as("h"))
        .groupBy("size", "h"))
      .select("doc_id", "n_merged", "rep_quality")
    nearKept.unionAll(shortKept)
    }
}
