package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>) — the similarity-search tier of the training-data
  * pipeline. Two paths:
  *
  *   - brute-force cosine top-k: the exactness baseline. Quadratic in the
  *     pair space, so callers bound one side (a query set); at cluster scale
  *     the query side is broadcast and the corpus side streams — one scan,
  *     no shuffle of the corpus.
  *   - random-hyperplane LSH (multi-table): corpus is bucketed by L
  *     sign-bit signatures computed map-side; candidates come from bucket
  *     equi-joins — the 100 TB path (scan + bounded bucket joins).
  *
  * Embeddings are quantized to integers (floor(x*1000)) before any dot
  * product so every similarity is exact integer arithmetic + one sqrt —
  * bit-identical across engines and partitionings (no float-sum order
  * sensitivity), and ~4× less data moved when signatures shuffle.
  */
object Ann {

  /** Quantize float32 embedding to bigint milli-units (exact both engines). */
  def quantize(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors (codegen'd single
    * loop; the zip_with+aggregate built-in form allocates per row and was
    * the bench's dominant cost on 10^7-pair workloads). */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.NearDupFunctions.dotProductL(a, b)

  /** Cosine over quantized vectors: dot / sqrt(na*nb) — one sqrt, one
    * divide; all inputs exact integers. */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      sqrt((dotQ(a, a) * dotQ(b, b)).cast("double"))

  /** Brute-force cosine top-k: for each query vector (vec_id ∈ queryIds),
    * the k nearest others by cosine (ties → lower neighbor id). */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    // per-vector norms are computed once per side, not once per pair
    val q = embeddings.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), quantize(col("embedding")).as("qv"))
      .withColumn("nq", dotQ(col("qv"), col("qv")))
    val c = embeddings
      .select(col("vec_id").as("neighbor_id"), quantize(col("embedding")).as("nv"))
      .withColumn("nn", dotQ(col("nv"), col("nv")))
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", graft.text.TextAnalysis.r6(
        dotQ(col("qv"), col("nv")).cast("double") /
          sqrt((col("nq") * col("nn")).cast("double"))))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** LSH-bucketed ANN: candidates share at least one table's bucket with the
    * query; exact cosine + top-k within candidates. The scale path — the
    * candidate join is L equi-joins on (table, signature); signatures are a
    * single map-side codegen'd expression (no per-plane column explosion). */
  def lshTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
              tables: Int = 16, bits: Int = 6): DataFrame = {
    val signed = embeddings
      .withColumn("qv", quantize(col("embedding")))
      .withColumn("sigs",
        graft.functions.NearDupFunctions.lshSignatures(col("qv"), tables, bits))
    val buckets = signed.select(col("vec_id"), col("qv"), posexplode(col("sigs")))
      .select(col("vec_id"), col("qv"), col("pos").as("t"), col("col").as("sig"))
    val q = buckets.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("qv").as("qvq"),
        col("t"), col("sig"))
    val cands = broadcast(q)
      .join(buckets.withColumnRenamed("vec_id", "neighbor_id"), Seq("t", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qvq", "neighbor_id", "qv").distinct()
    cands
      .withColumn("cos", graft.text.TextAnalysis.r6(
        dotQ(col("qvq"), col("qv")).cast("double") /
          sqrt((dotQ(col("qvq"), col("qvq")) * dotQ(col("qv"), col("qv"))).cast("double"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path: every
    * vector is assigned to its nearest of K centroid lists (argmax cosine,
    * computed map-side against the BROADCAST centroid set — K ≪ N); a query
    * probes its `nProbe` nearest lists and searches exactly within them.
    * At cluster scale the corpus table is clustered by `cid`, so a probe
    * reads nProbe/K of the data — the IVF layout.
    *
    * Centroid "training" is a deterministic hash-rank sample of FIXED size
    * `nLists` — K is a config constant chosen independently of the corpus
    * (256–4096 on a real cluster), so assignment is O(N·K) work against a
    * bounded broadcast at any scale. (An earlier every-Nth-vector scheme
    * made K grow with N — O(N²/step) assignment and an unbounded broadcast,
    * a 100 TB scale-killer.) The hash rank (vec_id·2654435761 mod P) is a
    * stand-in for k-means‖ that both engines reproduce exactly; the pick is
    * a distributed top-K (TakeOrdered over ids only), never a full sort.
    *
    * Assignment aggregates with max_by over a struct key (partial-agg
    * friendly — no N×K window shuffle); ordering ties break toward the
    * lower centroid id in both engines. */
  def ivfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
              nLists: Int = 16, nProbe: Int = 3,
              lloydIters: Int = 0): DataFrame =
    graft.util.PersistScope.scoped { scope =>
    val v = scope.persist(
      embeddings.select(col("vec_id"), quantize(col("embedding")).as("qv"))
        .withColumn("nv", dotQ(col("qv"), col("qv"))))
    // centroids: the deterministic fixed-K hash-rank sample
    // ((id mod P)·2654435761 stays < 2^63 — exact in both engines), or the
    // Lloyd-trained refinement of it when lloydIters > 0
    val cent =
      if (lloydIters > 0)
        kmeansFrom(v, nLists, lloydIters)
          .withColumn("cn", dotQ(col("cv"), col("cv")))
      else v
        .withColumn("__hk", (col("vec_id") % lit(2147483647L)) * lit(2654435761L) % lit(2147483647L))
        .orderBy(col("__hk"), col("vec_id")).limit(nLists)
        .select(col("vec_id").as("cid"), col("qv").as("cv"), col("nv").as("cn"))
    val scored = v.crossJoin(broadcast(cent))
      .withColumn("ccos", graft.text.TextAnalysis.r6(
        dotQ(col("qv"), col("cv")).cast("double") /
          sqrt((col("nv") * col("cn")).cast("double"))))
    val assign = scored.groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"))
    val probes = scored.filter(col("vec_id").isin(queryIds: _*))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("ccos").desc, col("cid"))))
      .filter(col("rn") <= nProbe)
      .select(col("vec_id").as("query_id"), col("cid"))
    val cands = broadcast(probes)
      .join(assign.withColumnRenamed("vec_id", "neighbor_id"), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    cands
      .join(v.select(col("vec_id").as("query_id"), col("qv").as("qa"), col("nv").as("na")),
        Seq("query_id"))
      .join(v.select(col("vec_id").as("neighbor_id"), col("qv").as("qb"), col("nv").as("nb")),
        Seq("neighbor_id"))
      .withColumn("cos", graft.text.TextAnalysis.r6(
        dotQ(col("qa"), col("qb")).cast("double") /
          sqrt((col("na") * col("nb")).cast("double"))))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
    }

  /** Deterministic k-means (Lloyd) centroid training over quantized
    * embeddings — genuine IVF "training", not a sampling stub, and exact
    * enough for the hash gate: seeds are the fixed-K hash-rank sample
    * (cid = 0..k-1 in seed-rank order), each iteration assigns every vector
    * to its argmax-cosine centroid (map-side against the BROADCAST K-row
    * set) and recomputes per-dimension floor-means. All arithmetic is
    * integers plus one IEEE-correctly-rounded double division per
    * dimension, so centroids are bit-identical across engines and
    * partitionings — the DuckDB oracle replays both iterations in SQL
    * (q_kmeans).
    *
    * Scale shape per iteration: one O(N·K) map-side scoring pass (no
    * shuffle of vectors beyond the partial aggregation), one (cid, dim)
    * aggregation — K·dim rows after map-side combine. Empty clusters keep
    * their previous centroid. Output: (cid, cv array<long>). */
  def kmeansCentroids(embeddings: DataFrame, k: Int = 16, iters: Int = 2): DataFrame =
    graft.util.PersistScope.scoped { scope =>
      kmeansFrom(scope.persist(
        embeddings.select(col("vec_id"), quantize(col("embedding")).as("qv"))
          .withColumn("nv", dotQ(col("qv"), col("qv")))), k, iters)
    }

  /** Lloyd training from a prepared `(vec_id, qv, nv)` frame (caller
    * persists it) — shared with [[ivfTopK]] so the quantize+norm pass over
    * the corpus is never duplicated. */
  private[sim] def kmeansFrom(v: DataFrame, k: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // seed: fixed-K hash-rank sample; the rank window runs on K rows
    // AFTER the distributed TakeOrdered, never on the corpus
    val hk = (col("vec_id") % lit(2147483647L)) * lit(2654435761L) % lit(2147483647L)
    var cent = v.withColumn("__hk", hk)
      .orderBy(col("__hk"), col("vec_id")).limit(k)
      .withColumn("cid",
        row_number().over(Window.orderBy(col("__hk"), col("vec_id"))).cast("long") - 1)
      .select(col("cid"), col("qv").as("cv"))
    for (_ <- 1 to iters) {
      val c = cent.withColumn("cn", dotQ(col("cv"), col("cv")))
      val asg = v.crossJoin(broadcast(c))
        .withColumn("ccos", graft.text.TextAnalysis.r6(
          dotQ(col("qv"), col("cv")).cast("double") /
            sqrt((col("nv") * col("cn")).cast("double"))))
        .groupBy("vec_id")
        .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"))
      val sums = asg.join(v.select("vec_id", "qv"), Seq("vec_id"))
        .select(col("cid"), posexplode(col("qv")))
        .groupBy("cid", "pos").agg(sum("col").as("s"), count(lit(1)).as("n"))
      val updated = sums
        .withColumn("cval", floor(col("s").cast("double") / col("n")).cast("long"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(pos, cval))), x -> x.cval)")
          .as("cv"))
      // the new centroid plan references the old one ~3x (assignment,
      // carryover anti-join, its key projection): checkpoint the K-row
      // frame per iteration or the plan grows ~3^iters
      cent = updated.unionByName(
        cent.join(updated.select("cid"), Seq("cid"), "left_anti"))
        .localCheckpoint(true)
    }
    cent
  }

  /** Materialize the IVF layout: every vector assigned to its coarse list
    * (same fixed-K hash-rank centroids as [[ivfTopK]]) and stored as
    * parquet PARTITIONED BY cid — the sandbox stand-in for an Iceberg table
    * clustered by list id — with the K centroid rows alongside. This is the
    * scaladoc claim of [[ivfTopK]] made physical: once the corpus is laid
    * out by cid, a probe's `cid IN (...)` predicate partition-prunes the
    * scan to nProbe of the K lists — the inverted-file read, verified by
    * AnnSpec on the scan's numFiles metric. */
  def writeIvfIndex(embeddings: DataFrame, dir: String, nLists: Int = 16): Unit = {
    val scope = new graft.util.PersistScope
    try {
      val v = scope.persist(
        embeddings.select(col("vec_id"), quantize(col("embedding")).as("qv"))
          .withColumn("nv", dotQ(col("qv"), col("qv"))))
      val cent = v
        .withColumn("__hk", (col("vec_id") % lit(2147483647L)) * lit(2654435761L) % lit(2147483647L))
        .orderBy(col("__hk"), col("vec_id")).limit(nLists)
        .select(col("vec_id").as("cid"), col("qv").as("cv"), col("nv").as("cn"))
      val scored = v.crossJoin(broadcast(cent))
        .withColumn("ccos", graft.text.TextAnalysis.r6(
          dotQ(col("qv"), col("cv")).cast("double") /
            sqrt((col("nv") * col("cn")).cast("double"))))
      val assign = scored.groupBy("vec_id")
        .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"))
      v.join(assign, Seq("vec_id"))
        .write.partitionBy("cid").mode("overwrite").parquet(s"$dir/lists")
      cent.write.mode("overwrite").parquet(s"$dir/centroids")
      // layout metadata: probes validate against this instead of silently
      // returning different neighbors when the stored dir was written with
      // a different nLists or centroid rule
      val spark = embeddings.sparkSession
      import spark.implicits._
      Seq((IvfLayoutVersion, nLists))
        .toDF("layout_version", "n_lists")
        .write.mode("overwrite").parquet(s"$dir/meta")
    } finally scope.release()
  }

  /** Version tag of the IVF layout contract: centroid rule (fixed-K
    * hash-rank sample), list partitioning, column names. Bump on any change
    * so stale stored layouts are rejected rather than silently probed. */
  val IvfLayoutVersion = "ivf:v1:hashrank"

  /** The pruned inverted-list scan: a LITERAL cid predicate over the
    * partitioned layout, so the file source prunes non-probed lists before
    * reading a byte. */
  def ivfLists(spark: org.apache.spark.sql.SparkSession, dir: String,
               cids: Seq[Long]): DataFrame =
    spark.read.parquet(s"$dir/lists").filter(col("cid").isin(cids: _*))

  /** Top-k probe against the STORED layout: score queries against the K
    * stored centroids, resolve the nProbe list ids (a tiny driver-side
    * collect — nQueries × nProbe longs, the literals partition pruning
    * needs), then search exactly within only those lists. Returns the same
    * relation shape as [[ivfTopK]] and — by construction, same centroid
    * rule — the same rows. */
  def ivfProbeStored(spark: org.apache.spark.sql.SparkSession, dir: String,
                     queryIds: Seq[Long], k: Int, nProbe: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val cent = spark.read.parquet(s"$dir/centroids")
    // validate the stored layout before trusting it: a dir written under a
    // different centroid rule or nLists must FAIL, not return different
    // neighbors. Older dirs without meta are rejected too (re-write them).
    val meta = try spark.read.parquet(s"$dir/meta").collect()
      catch { case _: Exception => Array.empty[org.apache.spark.sql.Row] }
    require(meta.nonEmpty, s"$dir has no IVF layout metadata — " +
      "re-run writeIvfIndex (refusing to probe an unversioned layout)")
    val (ver, nLists) = (meta(0).getAs[String]("layout_version"),
      meta(0).getAs[Int]("n_lists"))
    require(ver == IvfLayoutVersion,
      s"$dir layout version '$ver' != expected '$IvfLayoutVersion'")
    val nCent = cent.count()
    require(nCent == nLists,
      s"$dir stores $nCent centroids but meta says nLists=$nLists")
    val q = spark.read.parquet(s"$dir/lists")
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("qv").as("qa"), col("nv").as("na"))
    val probeRows = q.crossJoin(broadcast(cent))
      .withColumn("ccos", graft.text.TextAnalysis.r6(
        dotQ(col("qa"), col("cv")).cast("double") /
          sqrt((col("na") * col("cn")).cast("double"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("ccos").desc, col("cid"))))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val probePairs = probeRows.toSeq.toDF("query_id", "cid")
    val cands = ivfLists(spark, dir, probeRows.map(_._2).distinct.toSeq)
      .join(broadcast(probePairs), Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qv").as("qb"), col("nv").as("nb"))
    cands
      .join(q, Seq("query_id"))
      .withColumn("cos", graft.text.TextAnalysis.r6(
        dotQ(col("qa"), col("qb")).cast("double") /
          sqrt((col("na") * col("nb")).cast("double"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** L2 norm (quantized, exact) per vector. */
  def norms(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("qv", quantize(col("embedding")))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        graft.text.TextAnalysis.r6(sqrt(dotQ(col("qv"), col("qv")).cast("double"))).as("norm_q"))

  /** Bucket width that keeps expected hyperplane-bucket population near
    * `targetBucket` as the corpus grows: bits ≈ log2(n / target). The
    * embedding tier's blocking discipline matches the text tier's — at 100×
    * the data, pass `bits = bitsFor(n)` so buckets stay bounded instead of
    * each holding n/2^bits members.
    *
    * Pick `targetBucket` by access pattern: top-k PROBING reads a bucket
    * linearly, so ~512 is fine (the default); the DEDUP pair join is
    * QUADRATIC per bucket — target ~32-64 there (candidate volume ≈
    * tables × n × target/2, so a 512-wide bucket costs 8-16× the pair work
    * of a 64-wide one for the same recall at high thresholds: near-identical
    * vectors agree on almost every hyperplane, so finer buckets barely cost
    * recall). */
  def bitsFor(n: Long, targetBucket: Int = 512): Int =
    math.max(4, 63 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, n / math.max(1, targetBucket))))

  /** Embedding-cosine near-dup pairs, LSH-blocked: candidates are pairs
    * sharing at least one random-hyperplane bucket (equi-join on
    * (table, signature) — never an all-pairs product); exact quantized
    * cosine ≥ threshold verifies within candidates. This IS the operator's
    * semantics (blocked, like the text tier's MinHash-LSH): the bucket join
    * is the 100 TB path, and the oracle reproduces the identical blocking.
    *
    * The bucket self-join goes through [[graft.skew.Salting.bucketPairs]] —
    * the same cap/salt discipline as the text tier: buckets over `maxBucket`
    * are dropped with a log line (a bucket holding a large corpus fraction
    * is all-pairs-shaped work with no discriminative signal), buckets over
    * `hotBucket` take the salted two-phase join so one hot bucket's
    * quadratic work spreads across `salts` tasks.
    *
    * Recall rises with `tables` and falls with `bits`; at scale pass
    * `bits = bitsFor(n)` so bucket population stays bounded (16×4 ⇒ 0.82
    * recall at cos 0.40 on the 500-vector fixture, measured vs the
    * all-pairs baseline in AnnSpec). */
  def cosineDupPairs(embeddings: DataFrame, threshold: Double,
                     tables: Int = 16, bits: Int = 4,
                     maxBucket: Int = 4096, hotBucket: Int = 512,
                     salts: Int = 16): DataFrame =
    graft.util.PersistScope.scoped { scope =>
    val v = scope.persist(
      embeddings.select(col("vec_id"), quantize(col("embedding")).as("qv"))
        .withColumn("nv", dotQ(col("qv"), col("qv"))))
    val buckets = scope.persist(v
      .withColumn("sigs",
        graft.functions.NearDupFunctions.lshSignatures(col("qv"), tables, bits))
      .select(col("vec_id"), posexplode(col("sigs")))
      .select(col("vec_id"), col("pos").as("t"), col("col").as("sig")))
    val cands = graft.skew.Salting.bucketPairs(buckets, Seq("t", "sig"),
      "vec_id", Nil, maxBucket, hotBucket, salts, scope)
      .select("a", "b").distinct()
    // vectors fetched per candidate (a tiny subset at scale), norms reused
    cands
      .join(v.select(col("vec_id").as("a"), col("qv").as("va"), col("nv").as("na")), Seq("a"))
      .join(v.select(col("vec_id").as("b"), col("qv").as("vb"), col("nv").as("nb")), Seq("b"))
      .withColumn("cos", graft.text.TextAnalysis.r6(
        dotQ(col("va"), col("vb")).cast("double") /
          sqrt((col("na") * col("nb")).cast("double"))))
      .filter(col("cos") >= threshold)
      .select("a", "b", "cos")
    }

  /** Exact all-pairs cosine baseline (bounded inputs only — the recall
    * yardstick for [[cosineDupPairs]] in AnnSpec, never the scale path). */
  def cosineDupPairsExact(embeddings: DataFrame, threshold: Double): DataFrame = {
    val v = embeddings.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("nv", dotQ(col("qv"), col("qv")))
    val l = v.select(col("vec_id").as("a"), col("qv").as("va"), col("nv").as("na"))
    val r = v.select(col("vec_id").as("b"), col("qv").as("vb"), col("nv").as("nb"))
    l.join(r, col("a") < col("b"))
      .withColumn("cos", graft.text.TextAnalysis.r6(
        dotQ(col("va"), col("vb")).cast("double") /
          sqrt((col("na") * col("nb")).cast("double"))))
      .filter(col("cos") >= threshold)
      .select("a", "b", "cos")
  }
}
