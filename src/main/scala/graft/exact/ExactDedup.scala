package graft.exact

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Configuration of the exact-dedup cascade, mirroring the reference's knobs:
  *   - `minSize`   — minimum content size scanned; default 1 so empty files
  *                   are ignored (/root/reference/src/main.c:66,350-351,
  *                   docs/design.md:68-76)
  *   - `prefixLen` — first-K-chars partial-hash budget, the analogue of
  *                   `--firstblocksize × --firstblocks` = 512 KiB
  *                   (/root/reference/src/main.c:67-68,408-412); sized for
  *                   document-scale content here, configurable for file-scale
  *   - `includeHidden` — the `--hidden` flag (/root/reference/src/scan.c:246-249)
  */
/** @param hashAlg digest selection, the reference's `--hash`
  *   (/root/reference/src/options.conf:90, src/main.c:357-370; digest widths
  *   src/hash.c:258-278): "sha256" (default invariant per input_hint),
  *   "md5", "sha1", "sha512", or "xxh64" (Spark's xxhash64 — NOT
  *   byte-compatible with the reference's seed-1 xxHash, same role only). */
/** @param repos scan roots — the reference's multiple `--path` roots
  *   (/root/reference/src/scan.c:440-452, max 10) and the one-file-system
  *   filter F5 (/root/reference/src/scan.c:327-333: never cross a device
  *   boundary): in the table model a repo IS the device/root, so
  *   restricting the scan to named repos is both operators. Empty = all. */
final case class DedupConfig(
    minSize: Long = 1L,
    prefixLen: Int = 64,
    includeHidden: Boolean = false,
    hashAlg: String = "sha256",
    repos: Seq[String] = Nil)

/** dupd's exact-duplicate detection as a staged, Spark-native cascade.
  *
  * The reference is a 3-stage cascaded group-by with early pruning — group by
  * an ever-more-expensive key, drop singleton groups at each stage
  * (SURVEY.md §2.3; size tree /root/reference/src/sizetree.c:163-208, round-1
  * partial hash /root/reference/src/hashers.c:181-257, full hash + publish
  * /root/reference/src/hashlist.c:342-427). Here each stage is a hash
  * aggregate on a cheap key followed by a semi-join of the survivors:
  *
  *   stage 1  groupBy(size)          — touches ONLY the size column (Parquet
  *            column pruning: unique-size files never have content read, the
  *            exact analogue of "files of unique size are never opened")
  *   stage 2  groupBy(size, prefix_hash) on stage-1 survivors
  *   stage 3  groupBy(size, full_hash) → duplicate sets (count ≥ 2)
  *
  * Scale design (100 TB / 10^12 rows):
  *   - `content` is NEVER shuffled: hashes are computed map-side and only
  *     (size, hash, identity) columns cross stage boundaries.
  *   - stage results are (key, count) aggregates — orders of magnitude
  *     smaller than the input — joined back broadcast-when-small (AQE decides;
  *     partial/map-side aggregation bounds the shuffle to distinct keys).
  *   - the flat per-member output (`duplicates`) avoids collect_list hot keys
  *     for million-member vendored-file sets; the set-level view
  *     (`duplicateSets`) is derived from it for report-scale data.
  */
object ExactDedup {

  /** F1 — hidden-file filter: any path segment starting with '.'
    * (/root/reference/src/scan.c:246-249, docs/design.md:53-64). */
  def notHidden(path: Column): Column =
    !(path.startsWith(".") || path.contains("/."))

  /** F1 + F2 + F5/S1-roots applied up front; Catalyst pushes all three into
    * the scan (repo is the partition column at Iceberg scale — the isin
    * prunes partitions, the exact analogue of never crossing st_dev). */
  def scanFilter(files: DataFrame, cfg: DedupConfig): DataFrame = {
    val f0 = if (cfg.repos.isEmpty) files
             else files.filter(col("repo").isin(cfg.repos: _*))
    val f = f0.filter(col("size") >= cfg.minSize)
    if (cfg.includeHidden) f else f.filter(notHidden(col("path")))
  }

  /** Stage 1 (A1/A2): sizes with ≥ 2 candidates. Aggregates on the size
    * column alone — at 10^12 rows this is a long-only shuffle of distinct
    * sizes (~10^6), and files of unique size never get content read. */
  def candidateSizes(files: DataFrame, cfg: DedupConfig): DataFrame =
    scanFilter(files, cfg)
      .groupBy("size").agg(count(lit(1)).as("n_files"))
      .filter(col("n_files") >= 2)

  /** Stage-1 survivors: joined against the (small) candidate-size set.
    * INNER, not left-semi: the size set is an aggregate (unique on size)
    * contributing no columns, so inner ≡ semi — and Catalyst pushes a
    * left-semi through the corpus Union (PushdownLeftSemiAntiJoin),
    * duplicating the aggregate's build into every union branch (the same
    * 5x plan blowup representatives had, NearDup.scala:97-112). */
  def sizeSurvivors(files: DataFrame, cfg: DedupConfig): DataFrame =
    scanFilter(files, cfg)
      .join(candidateSizes(files, cfg).select("size"), Seq("size"))

  /** C1–C4: digest of a content column under the configured algorithm. */
  def digest(c: Column, cfg: DedupConfig): Column = cfg.hashAlg match {
    case "sha256" => sha2(c, 256)
    case "sha512" => sha2(c, 512)
    case "md5"    => md5(c)
    case "sha1"   => sha1(c)
    case "xxh64"  => xxhash64(c).cast("string")
    case other    => throw new IllegalArgumentException(s"unknown hashAlg $other")
  }

  private def prefixHash(cfg: DedupConfig): Column =
    digest(substring(col("content"), 1, cfg.prefixLen), cfg)

  /** The narrow fact relation: ONE content pass over stage-1 survivors
    * computing both hashes, content projected away immediately —
    * (file_id, repo, path, commit, size, prefix_hash, hash) is ~0.1% of the
    * input width, so persisting it is cheap even at 10^12 rows (dupd's hash
    * cache db plays this role, /root/reference/src/dbops.c:84-96).
    *
    * Persisting matters for plan shape too: the cascade's stages each
    * aggregate over and semi-join back to this relation; without a
    * materialization point Catalyst duplicates the whole upstream subtree
    * per consumer — the un-persisted form of `uniques` planned at 8.7k
    * physical nodes (45 parquet scans). Spark's CacheManager matches by
    * canonicalized plan, so every query deriving from the same files/config
    * shares one cached copy. */
  def hashedNarrow(files: DataFrame, cfg: DedupConfig): DataFrame = {
    val scanned = scanFilter(files, cfg)
    val sizes = scanned.groupBy("size").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select("size")
    // inner ≡ semi (sizes unique on size, no extra columns) and is not
    // pushed through the corpus Union — see sizeSurvivors
    scanned.join(sizes, Seq("size"))
      .select(col("file_id"), col("repo"), col("path"), col("commit"),
        col("size"), prefixHash(cfg).as("prefix_hash"),
        digest(col("content"), cfg).as("hash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Stage 2 (A3): (size, partial-hash) groups with ≥ 2 members among
    * stage-1 survivors — the first-K-bytes prune. */
  def partialHashGroups(files: DataFrame, cfg: DedupConfig): DataFrame =
    hashedNarrow(files, cfg)
      .groupBy("size", "prefix_hash").agg(count(lit(1)).as("n_files"))
      .filter(col("n_files") >= 2)

  /** Stage 2 survivors — (identity, size, hashes); content never enters a
    * shuffle anywhere in the cascade. */
  def hashedSurvivors(files: DataFrame, cfg: DedupConfig): DataFrame = {
    val narrow = hashedNarrow(files, cfg)
    val phGroups = narrow.groupBy("size", "prefix_hash")
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select("size", "prefix_hash")
    narrow.join(phGroups, Seq("size", "prefix_hash"), "left_semi")
  }

  /** Stage 3 (A4/A5): confirmed duplicates, one row per member — columns
    * (file_id, repo, path, commit, size, hash, set_size). The flat form is
    * the scale path (no giant arrays on hot hashes). */
  def duplicates(files: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame = {
    val survivors = hashedSurvivors(files, cfg)
    val sets = survivors.groupBy("size", "hash")
      .agg(count(lit(1)).as("set_size"))
      .filter(col("set_size") >= 2)
    survivors.join(sets, Seq("size", "hash"))
      .select("file_id", "repo", "path", "commit", "size", "hash", "set_size")
  }

  /** A5 set-level publication — one row per duplicate set with sorted member
    * ids (the relational form of the reference's `\x1C`-joined `paths` TEXT,
    * /root/reference/src/dbops.c:420-452). */
  def duplicateSets(files: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame =
    duplicates(files, cfg)
      .groupBy("size", "hash")
      .agg(
        count(lit(1)).cast("long").as("set_size"),
        array_join(transform(array_sort(collect_list(col("file_id"))),
          _.cast("string")), ",").as("members"))
      .withColumnRenamed("size", "each_size")

  /** A8/O1 — the `dupd report` projection: total duplicated bytes per set,
    * ascending (worst offenders last, /root/reference/src/report.c:288-386). */
  def report(files: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame =
    duplicateSets(files, cfg)
      .select(col("hash"), col("each_size"), col("set_size"),
        (col("each_size") * col("set_size")).as("total"), col("members"))
      .orderBy(col("total"), col("hash"))

  /** §2.7 set operations — `uniques`: files NOT in any duplicate set
    * (anti-join of the snapshot against confirmed dups,
    * /root/reference/src/report.c:485-542).
    *
    * Written as LEFT OUTER + null filter, not `left_anti`: member ids are
    * unique in the flat duplicates relation (no fanout, so the two are
    * row-identical), but Catalyst pushes a LEFT-ANTI through the corpus
    * Union (PushdownLeftSemiAntiJoin), replicating the join into every
    * branch — 5 probe joins and the plan fragmentation that came with them
    * (round-6 job accounting: 59 executions for this one query, 4× the
    * duplicates pipeline it wraps). Left-outer joins are not distributed
    * over unions; this plan probes once. */
  def uniques(files: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame =
    scanFilter(files, cfg)
      .join(duplicates(files, cfg).select(col("file_id"), lit(true).as("__dup")),
        Seq("file_id"), "left")
      .filter(col("__dup").isNull)
      .select("file_id", "repo", "path", "size")

  /** `dups`: files that ARE members of a duplicate set (semi-join). */
  def dups(files: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame =
    duplicates(files, cfg).select("file_id", "repo", "path", "size", "hash", "set_size")

  /** J1/J2 — `dupd file <path>` lookup with re-verification semantics:
    * claimed members are re-evaluated against the CURRENT snapshot (content
    * re-hashed now, not trusted from scan time) —
    * /root/reference/src/report.c:402-460. Output: the set members of the
    * probed file with status DUP for verified-identical members.
    *
    * Probe-pushdown plan (dupd's `file` is an index lookup against the
    * stored scan, /root/reference/src/dbops.c:508-642 — NOT a rescan): the
    * probe's (size, hash) is resolved first (two scalar jobs), then only
    * same-size rows are hashed — `size = <k>` is a partition-prunable
    * predicate at Iceberg scale, so the full cascade never runs. */
  def fileLookup(files: DataFrame, probeFileId: Long,
                 cfg: DedupConfig = DedupConfig()): DataFrame = {
    val scanned = scanFilter(files, cfg)
    val members = probeSetMembers(scanned, probeFileId, cfg)
    members
      .select(col("file_id"), col("repo"), col("path"),
        when(col("file_id") === probeFileId, "SELF").otherwise("DUP").as("status"))
  }

  /** Members of the probe's duplicate set evaluated via probe pushdown as
    * ONE plan: the probe's (size, digest, path) is a 1-row broadcast built
    * from the `file_id = <k>` index lookup — no driver collect round-trip
    * (the former two scalar jobs cost a full probe-resolution scan per
    * query) — and only same-size rows are hashed; empty when the probe is
    * unique (set size < 2) or absent. `content` is projected away before
    * the window shuffle: only the dup-set members' identity columns cross
    * the Exchange. Columns: (file_id, repo, path, size, hash,
    * __probe_path). */
  private def probeSetMembers(scanned: DataFrame, probeFileId: Long,
                              cfg: DedupConfig): DataFrame = {
    val probe = scanned.filter(col("file_id") === probeFileId)
      .select(col("size"), digest(col("content"), cfg).as("__probe_hash"),
        col("path").as("__probe_path"))
    scanned.join(broadcast(probe), Seq("size"))
      .withColumn("hash", digest(col("content"), cfg))
      .filter(col("hash") === col("__probe_hash"))
      .select(col("file_id"), col("repo"), col("path"), col("size"),
        col("hash"), col("__probe_path"))
      // dup-set semantics: a singleton set is not a duplicate set
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("size", "hash")))
      .filter(col("__n") >= 2).drop("__n")
  }

  /** `ls` — every scanned file with its DUPLICATE/UNIQUE status: the
    * reference's operation_ls sets BOTH print_uniques and print_duplicates
    * (/root/reference/src/report.c:485-542 — every file listed). */
  def fileStatusesAll(files: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // conditional-hash staging (same trick as NearDup.representatives):
    // a size-count broadcast guards the digest behind when(n >= 2), with ''
    // as the unique-size sentinel — a unique-size file is UNIQUE without
    // its content ever being read (one row per unique size, so (size, '')
    // is a singleton window group and classifies UNIQUE). At corpus scale
    // this skips the content pass for the unique-size fraction, exactly
    // like the cascade's stage 1 ("files of unique size are never opened").
    val scanned = scanFilter(files, cfg)
    val sizeN = scanned.groupBy("size").agg(count(lit(1)).as("__n"))
    scanned.join(sizeN, Seq("size"))
      .withColumn("hash",
        when(col("__n") >= 2, digest(col("content"), cfg)).otherwise(lit("")))
      .withColumn("__m", count(lit(1)).over(Window.partitionBy("size", "hash")))
      .withColumn("status", when(col("__m") >= 2, "DUPLICATE").otherwise("UNIQUE"))
      .select("file_id", "repo", "path", "size", "status")
  }

  /** J1 against a STORED duplicates relation (the dupd scan/query split:
    * query ops read the db, they do not rescan —
    * /root/reference/src/dbops.c:508-642). `dups` is the flat output of
    * [[duplicates]] (or the checkpointed scan). */
  def fileLookupIn(dups: DataFrame, probeFileId: Long): DataFrame = {
    val probe = dups.filter(col("file_id") === probeFileId).select("size", "hash")
    dups.join(broadcast(probe), Seq("size", "hash"))
      .select(col("file_id"), col("repo"), col("path"),
        when(col("file_id") === probeFileId, "SELF").otherwise("DUP").as("status"))
  }

  /** J2 against a STORED duplicates relation with re-verification vs the
    * CURRENT snapshot: DUP only if the member still exists with identical
    * content now (the reference's safety guarantee,
    * /root/reference/src/report.c:218-281). Only claimed members are
    * re-hashed (semi-join first), never the whole snapshot. */
  def fileStatusesIn(dups: DataFrame, snapshot: DataFrame, probeFileId: Long,
                     excludePrefix: Option[String] = None,
                     cfg: DedupConfig = DedupConfig()): DataFrame = {
    val probe = dups.filter(col("file_id") === probeFileId)
      .select(col("size"), col("hash"), col("path").as("__probe_path"))
    val members = dups.join(broadcast(probe), Seq("size", "hash"))
    val current = snapshot
      .join(members.select("file_id"), Seq("file_id")) // inner ≡ semi: member ids unique
      .select(col("file_id"), digest(col("content"), cfg).as("now_hash"))
    members.join(current, Seq("file_id"), "left")
      .withColumn("status",
        when(col("file_id") === probeFileId, "SELF")
          .when(excludePrefix.map(p =>
            concat(col("repo"), lit("/"), col("path")).startsWith(p))
            .getOrElse(lit(false)), "xxx")
          .when(col("now_hash").isNull, "---")
          // HL = verified member sharing the probe's link identity (same
          // path; reference st_ino == path_inode, src/report.c:260-264)
          .when(col("now_hash") === col("hash") &&
            col("path") === col("__probe_path"), "HL")
          .when(col("now_hash") === col("hash"), "DUP")
          .otherwise("---"))
      .select("file_id", "repo", "path", "status")
  }

  /** S8 — rm-shell projection: keep the first (lowest-id) member of each
    * set, list the rest for removal (/root/reference/src/report.c:549-600). */
  def rmsh(files: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame = {
    val d = duplicates(files, cfg)
    val keep = d.groupBy("size", "hash").agg(min("file_id").as("keep_id"))
    d.join(keep, Seq("size", "hash"))
      .filter(col("file_id") =!= col("keep_id"))
      .select(col("keep_id"), col("file_id").as("remove_id"), col("repo"), col("path"))
  }

  /** F6 — `--exclude-path`: members whose repo/path falls under the prefix
    * are marked `xxx` and never counted as duplicates; sets whose
    * non-excluded membership drops below 2 lose DUP status entirely
    * (/root/reference/src/report.c:248-251, options.conf:5). Input: the flat
    * duplicates relation; output adds (status, live_set_size) where status ∈
    * {DUP, xxx, UNIQUE} — UNIQUE = survivor of a set the exclusion broke. */
  def withExcludeStatus(duplicates: DataFrame, excludePrefix: String): DataFrame = {
    val flagged = duplicates.withColumn("excluded",
      concat(col("repo"), lit("/"), col("path")).startsWith(excludePrefix))
    val live = flagged.filter(!col("excluded"))
      .groupBy("size", "hash").agg(count(lit(1)).as("live_set_size"))
    flagged.join(live, Seq("size", "hash"), "left")
      .withColumn("live_set_size", coalesce(col("live_set_size"), lit(0L)))
      .withColumn("status",
        when(col("excluded"), "xxx")
          .when(col("live_set_size") >= 2, "DUP")
          .otherwise("UNIQUE"))
      .select("file_id", "repo", "path", "size", "hash", "status", "live_set_size")
  }

  /** File ids of duplicate-set members that still have ≥ 1 non-excluded
    * partner — the classification the reference's uniques/dups/ls listings
    * apply under `--exclude-path`: partners under the prefix get
    * STATUS_EXCLUDE and do not count toward verified_dups, so a file whose
    * only partners are excluded reads UNIQUE; the listed file itself is NOT
    * exempted by being under the prefix (its non-excluded partners still
    * count) — /root/reference/src/report.c:243-251,413-452. With no prefix
    * this is just the member id set. `dups` is the flat [[duplicates]]
    * relation (live or stored). */
  def dupIdsWithExclude(dups: DataFrame,
                        excludePrefix: Option[String]): DataFrame =
    excludePrefix match {
      case None => dups.select("file_id")
      case Some(p) =>
        val flagged = dups.withColumn("excluded",
          concat(col("repo"), lit("/"), col("path")).startsWith(p))
        val live = flagged.filter(!col("excluded"))
          .groupBy("size", "hash").agg(count(lit(1)).as("live"))
        flagged.join(live, Seq("size", "hash"), "left")
          .withColumn("live", coalesce(col("live"), lit(0L)))
          .withColumn("others",
            col("live") - when(!col("excluded"), lit(1L)).otherwise(lit(0L)))
          .filter(col("others") >= 1)
          .select("file_id")
    }

  /** J2 verbose — `dupd file -v` member statuses evaluated against the
    * CURRENT snapshot (/root/reference/src/report.c:218-281): DUP = member
    * still present and byte-identical now; `HL` = verified member sharing
    * the probe's link identity — st_ino == path_inode in the reference
    * (/root/reference/src/report.c:260-264, tests/test.44-48), same `path`
    * in the table model (identity = (path, content), as [[hardlinkUnique]]);
    * `---` = gone from the snapshot; `xxx` = under the exclude prefix. The
    * probed file's row is SELF. */
  def fileStatuses(scanned: DataFrame, snapshot: DataFrame, probeFileId: Long,
                   excludePrefix: Option[String] = None,
                   cfg: DedupConfig = DedupConfig()): DataFrame = {
    val scanned0 = scanFilter(scanned, cfg)
    // members carry the probe's path as a column (__probe_path), so the HL
    // link-identity test needs no driver-side probe resolution
    val members = probeSetMembers(scanned0, probeFileId, cfg)
    // re-verify NOW: a member counts as DUP only if the snapshot still has
    // this file_id with identical content (hash recomputed from snapshot;
    // only claimed members are re-hashed — semi-join first)
    val current = snapshot
      .join(members.select("file_id"), Seq("file_id")) // inner ≡ semi: member ids unique
      .select(col("file_id"), digest(col("content"), cfg).as("now_hash"))
    members.join(current, Seq("file_id"), "left")
      .withColumn("status",
        when(col("file_id") === probeFileId, "SELF")
          .when(excludePrefix.map(p =>
            concat(col("repo"), lit("/"), col("path")).startsWith(p))
            .getOrElse(lit(false)), "xxx")
          .when(col("now_hash").isNull, "---")
          .when(col("now_hash") === col("hash") &&
            col("path") === col("__probe_path"), "HL")
          .when(col("now_hash") === col("hash"), "DUP")
          .otherwise("---"))
      .select("file_id", "repo", "path", "status")
  }

  /** A6 — the reference's direct two-file block compare
    * (/root/reference/src/filecompare.c:44-111): equality on the content
    * column, one row (a, b, equal). */
  def compareTwo(files: DataFrame, a: Long, b: Long): DataFrame = {
    val fa = files.filter(col("file_id") === a).select(col("content").as("ca"))
    val fb = files.filter(col("file_id") === b).select(col("content").as("cb"))
    fa.crossJoin(fb)
      .select(lit(a).as("a"), lit(b).as("b"), (col("ca") === col("cb")).as("equal"))
  }

  /** §2.9 `refresh` — incremental batch re-check: drop set members no longer
    * in the current snapshot, keep only sets with ≥ 2 survivors
    * (/root/reference/src/refresh.c:37-143). `snapshot` is the current file
    * table (possibly with rows deleted since the scan). */
  def refresh(scanned: DataFrame, snapshot: DataFrame): DataFrame = {
    val surviving = scanned.join( // inner ≡ semi: right side is distinct
      snapshot.select("file_id").distinct(), Seq("file_id"))
    val counts = surviving.groupBy("size", "hash")
      .agg(count(lit(1)).as("set_size")).filter(col("set_size") >= 2)
    surviving.drop("set_size").join(counts, Seq("size", "hash"))
      .select("file_id", "repo", "path", "commit", "size", "hash", "set_size")
  }

  /** `validate` analogue — every member of every emitted set must be
    * byte-identical (/root/reference/tests/validate.pl:29-53): returns sets
    * whose members' contents diverge; empty result == valid.
    *
    * The divergence check counts distinct values of a SECOND, independent
    * map-side digest (sha512 when the primary is any other algorithm) —
    * detecting primary-digest collisions without raw content ever entering
    * a shuffle (a million-member vendored set would otherwise move its full
    * bytes through the countDistinct Exchange at the 100 TB target). The
    * digest is projected at the scan, so only (file_id, 128-char digest)
    * crosses the join/agg boundaries; a simultaneous collision in BOTH
    * digests is the residual false-negative, cryptographically negligible. */
  def validate(files: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame = {
    val secondAlg = if (cfg.hashAlg == "sha512") "sha256" else "sha512"
    val digested = files.select(col("file_id"),
      digest(col("content"), cfg.copy(hashAlg = secondAlg)).as("__d2"))
    duplicates(files, cfg)
      .select("file_id", "size", "hash")
      .join(digested, Seq("file_id"))
      .groupBy("size", "hash")
      .agg(countDistinct(col("__d2")).as("n_distinct_contents"))
      .filter(col("n_distinct_contents") > 1)
  }

  /** F8/J3 — the `--hardlink-is-unique` policy: rows sharing an identity
    * (same logical file reachable via several links) collapse to one physical
    * instance before dedup (/root/reference/src/readlist.c:269-297). In the
    * table model identity = (path, content-hash); keep the lowest file_id. */
  def hardlinkUnique(files: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // conditional-hash staging: a unique-size row cannot share content with
    // any other row, so it is its own link identity with NO content read —
    // the '' sentinel plus `size` in the identity key keeps two different
    // unique-size rows at the same path distinct ((path, szA, '') vs
    // (path, szB, '')); for multi-member size buckets same content implies
    // same size, so (path, size, hash) ≡ the (path, hash) identity.
    val scanned = scanFilter(files, cfg)
    val sizeN = scanned.groupBy("size").agg(count(lit(1)).as("__n"))
    scanned.join(sizeN, Seq("size"))
      .withColumn("h",
        when(col("__n") >= 2, sha2(col("content"), 256)).otherwise(lit("")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("path"), col("size"), col("h"))
          .orderBy(col("file_id"))))
      .filter(col("rn") === 1)
      .select("file_id", "repo", "path", "size")
  }

  /** A9/S9 — scan counters as a metrics row (the reference's ~60 counters,
    * /root/reference/src/stats.h:33-125, reduced to the semantic ones). */
  def stats(files: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame = {
    val scanned = scanFilter(files, cfg)
    val d = duplicates(files, cfg)
    val totals = scanned.agg(
      count(lit(1)).as("files_scanned"),
      sum("size").as("bytes_scanned"))
    val dupTotals = d.agg(
      count(lit(1)).as("dup_files"),
      countDistinct(col("hash"), col("size")).as("dup_sets"),
      sum("size").as("dup_bytes"))
    totals.crossJoin(dupTotals)
  }
}
