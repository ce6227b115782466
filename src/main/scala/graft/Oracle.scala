package graft

/** DuckDB oracle SQL mirroring the library's semantics over the same parquet
  * tables. The corpus CTE must stay column-for-column identical to
  * [[Tables.corpus]] — the driver hash-compares every query against these.
  */
object Oracle {

  /** Body of the corpus0 CTE, reusable by variant corpora (skew fixture). */
  val corpus0Body: String =
    """  SELECT doc_id AS file_id, source AS repo,
      |         concat('doc_', doc_id, '.txt') AS path, 'c0' AS "commit",
      |         lang, text AS content
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, 'mirror', concat('doc_', doc_id, '.txt'),
      |         'c0', lang, text FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000, 'mirror2', concat('doc_', doc_id, '.txt'),
      |         'c0', lang, text FROM documents WHERE doc_id % 9 = 0
      |  UNION ALL
      |  SELECT doc_id + 3000000, 'fork', concat('doc_', doc_id, '.txt'),
      |         'c0', lang, substr(text, 1, CAST(n_chars - 8 AS INT))
      |  FROM documents WHERE doc_id % 5 = 0
      |  UNION ALL
      |  SELECT doc_id + 4000000, 'foil', concat('doc_', doc_id, '.txt'),
      |         'c0', lang, substr(text, 1, CAST(n_chars - 1 AS INT)) || 'X'
      |  FROM documents WHERE doc_id % 7 = 0""".stripMargin

  /** SQL twin of [[Tables.corpus]]. */
  val corpusCte: String =
    s"""WITH corpus0 AS (
      |$corpus0Body
      |), corpus AS (""".stripMargin +
    """
      |  SELECT *, CAST(length(content) AS BIGINT) AS size FROM corpus0
      |), dupmembers AS (
      |  SELECT c.file_id, c.repo, c.path, c."commit", c.lang, c.content,
      |         c.size, s.hash, s.set_size
      |  FROM corpus c
      |  JOIN (SELECT size, sha256(content) AS hash, count(*) AS set_size
      |        FROM corpus WHERE size >= 1
      |        GROUP BY 1, 2 HAVING count(*) >= 2) s
      |    ON c.size = s.size AND sha256(c.content) = s.hash
      |), dupsets AS (
      |  SELECT size AS each_size, sha256(content) AS hash,
      |         count(*) AS set_size,
      |         string_agg(CAST(file_id AS VARCHAR), ',' ORDER BY file_id)
      |           AS members
      |  FROM corpus WHERE size >= 1
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |)
      |""".stripMargin

  private def c(sql: String): String = corpusCte + sql

  val sql: Map[String, String] = Map(
    "q_corpus" -> c(
      """SELECT file_id, repo, path, "commit", lang, content, size
        |FROM corpus""".stripMargin),

    "q_size_prune" -> c(
      """SELECT size, count(*) AS n_files FROM corpus WHERE size >= 1
        |GROUP BY size HAVING count(*) >= 2""".stripMargin),

    "q_partial_hash" -> c(
      """SELECT size, sha256(substr(content, 1, 64)) AS prefix_hash,
        |       count(*) AS n_files
        |FROM corpus
        |WHERE size >= 1 AND size IN (
        |  SELECT size FROM corpus WHERE size >= 1
        |  GROUP BY size HAVING count(*) >= 2)
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin),

    "q_scan_dups" -> c(
      """SELECT file_id, repo, path, "commit", size, hash, set_size
        |FROM dupmembers""".stripMargin),

    "q_dup_sets" -> c(
      "SELECT each_size, hash, set_size, members FROM dupsets"),

    "q_report" -> c(
      """SELECT hash, each_size, set_size, each_size * set_size AS total,
        |       members
        |FROM dupsets ORDER BY total, hash""".stripMargin),

    "q_report_min" -> c(
      """SELECT hash, each_size, set_size, each_size * set_size AS total,
        |       members
        |FROM dupsets WHERE each_size * set_size >= 600
        |ORDER BY total, hash""".stripMargin),

    "q_uniques" -> c(
      """SELECT file_id, repo, path, size FROM corpus WHERE size >= 1
        |QUALIFY count(*) OVER (PARTITION BY size, sha256(content)) = 1"""
        .stripMargin),

    "q_dups" -> c(
      "SELECT file_id, repo, path, size, hash, set_size FROM dupmembers"),

    "q_file_lookup" -> c(
      """SELECT d.file_id, d.repo, d.path,
        |       CASE WHEN d.file_id = 0 THEN 'SELF' ELSE 'DUP' END AS status
        |FROM dupmembers d
        |JOIN (SELECT size, hash FROM dupmembers WHERE file_id = 0) p
        |  ON d.size = p.size AND d.hash = p.hash""".stripMargin),

    "q_ls" -> c(
      """SELECT file_id, repo, path, size,
        |  CASE WHEN count(*) OVER (PARTITION BY size, sha256(content)) >= 2
        |       THEN 'DUPLICATE' ELSE 'UNIQUE' END AS status
        |FROM corpus WHERE size >= 1""".stripMargin),

    "q_rmsh" -> c(
      """SELECT s.keep_id, d.file_id AS remove_id, d.repo, d.path
        |FROM dupmembers d
        |JOIN (SELECT size, hash, min(file_id) AS keep_id FROM dupmembers
        |      GROUP BY 1, 2) s
        |  ON d.size = s.size AND d.hash = s.hash
        |WHERE d.file_id <> s.keep_id""".stripMargin),

    "q_refresh" -> (corpusCte.trim.dropRight(1) +
      """), surv AS (SELECT * FROM dupmembers WHERE repo <> 'mirror'),
        |s2 AS (SELECT size, hash, count(*) AS set_size FROM surv
        |       GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT surv.file_id, surv.repo, surv.path, surv."commit", surv.size,
        |       surv.hash, s2.set_size
        |FROM surv JOIN s2 ON surv.size = s2.size AND surv.hash = s2.hash"""
        .stripMargin),

    // incremental-dedup classification vs a stored scan that predates the
    // mirror2 repo: DB_DUP = content already duplicated in that db;
    // STREAM_DUP = later in-stream occurrence; FIRST = first sighting
    "q_incr_dedup" -> c(
      """SELECT c.file_id, c.size, sha256(c.content) AS hash,
        |  CASE WHEN d.size IS NOT NULL THEN 'DB_DUP'
        |       WHEN row_number() OVER (
        |              PARTITION BY c.size, sha256(c.content)
        |              ORDER BY c.file_id) > 1 THEN 'STREAM_DUP'
        |       ELSE 'FIRST' END AS status
        |FROM corpus c
        |LEFT JOIN (SELECT size, sha256(content) AS hash FROM corpus
        |           WHERE size >= 1 AND repo <> 'mirror2'
        |           GROUP BY 1, 2 HAVING count(*) >= 2) d
        |  ON c.size = d.size AND sha256(c.content) = d.hash
        |WHERE c.size >= 1""".stripMargin),

    "q_validate" -> c(
      """SELECT size, hash, count(DISTINCT content) AS n_distinct_contents
        |FROM dupmembers GROUP BY 1, 2
        |HAVING count(DISTINCT content) > 1""".stripMargin),

    "q_hardlink_unique" -> c(
      """SELECT file_id, repo, path, size FROM (
        |  SELECT file_id, repo, path, size, sha256(content) AS h
        |  FROM corpus WHERE size >= 1)
        |QUALIFY row_number() OVER (PARTITION BY path, h ORDER BY file_id) = 1"""
        .stripMargin),

    "q_scan_dups_md5" -> c(
      """SELECT c.file_id, c.repo, c.path, c."commit", c.size,
        |       md5(c.content) AS hash, s.set_size
        |FROM corpus c
        |JOIN (SELECT size, md5(content) AS hash, count(*) AS set_size
        |      FROM corpus WHERE size >= 1
        |      GROUP BY 1, 2 HAVING count(*) >= 2) s
        |  ON c.size = s.size AND md5(c.content) = s.hash""".stripMargin),

    "q_exclude_path" -> c(
      """SELECT file_id, repo, path, size, hash,
        |  CASE WHEN excluded THEN 'xxx'
        |       WHEN live_set_size >= 2 THEN 'DUP'
        |       ELSE 'UNIQUE' END AS status,
        |  live_set_size
        |FROM (
        |  SELECT d.file_id, d.repo, d.path, d.size, d.hash,
        |    (d.repo || '/' || d.path) LIKE 'mirror/%' AS excluded,
        |    CAST(sum(CASE WHEN (d.repo || '/' || d.path) LIKE 'mirror/%'
        |                  THEN 0 ELSE 1 END)
        |         OVER (PARTITION BY d.size, d.hash) AS BIGINT)
        |      AS live_set_size
        |  FROM dupmembers d)""".stripMargin),

    "q_file_verbose" -> c(
      """SELECT d.file_id, d.repo, d.path,
        |  CASE WHEN d.file_id = 0 THEN 'SELF'
        |       WHEN (d.repo || '/' || d.path) LIKE 'mirror/%' THEN 'xxx'
        |       WHEN s.h IS NULL THEN '---'
        |       WHEN s.h = d.hash THEN 'DUP'
        |       ELSE '---' END AS status
        |FROM dupmembers d
        |JOIN (SELECT size, hash FROM dupmembers WHERE file_id = 0) p
        |  ON d.size = p.size AND d.hash = p.hash
        |LEFT JOIN (SELECT file_id, sha256(content) AS h FROM corpus
        |           WHERE repo <> 'mirror2') s
        |  ON s.file_id = d.file_id""".stripMargin),

    // HL vs DUP split under a full snapshot: a verified member whose path
    // equals the probe's path is a hardlink member (link identity model);
    // snapshot == corpus, so every member re-verifies (no '---' branch)
    "q_file_hl" -> c(
      """SELECT d.file_id, d.repo, d.path,
        |  CASE WHEN d.file_id = 0 THEN 'SELF'
        |       WHEN d.path = p.ppath THEN 'HL'
        |       ELSE 'DUP' END AS status
        |FROM dupmembers d
        |JOIN (SELECT size, hash, path AS ppath FROM dupmembers
        |      WHERE file_id = 0) p
        |  ON d.size = p.size AND d.hash = p.hash""".stripMargin),

    "q_cmp_two" -> c(
      """SELECT CAST(0 AS BIGINT) AS a, CAST(1000000 AS BIGINT) AS b,
        |  (SELECT content FROM corpus WHERE file_id = 0) =
        |  (SELECT content FROM corpus WHERE file_id = 1000000) AS equal"""
        .stripMargin),

    "q_one_fs" -> c(
      """SELECT c.file_id, c.repo, c.path, c."commit", c.size,
        |       sha256(c.content) AS hash, s.set_size
        |FROM (SELECT * FROM corpus
        |      WHERE repo IN ('mirror', 'mirror2') AND size >= 1) c
        |JOIN (SELECT size, sha256(content) AS hash, count(*) AS set_size
        |      FROM corpus WHERE repo IN ('mirror', 'mirror2') AND size >= 1
        |      GROUP BY 1, 2 HAVING count(*) >= 2) s
        |  ON c.size = s.size AND sha256(c.content) = s.hash""".stripMargin),

    "q_stats" -> c(
      """SELECT
        |  (SELECT count(*) FROM corpus WHERE size >= 1) AS files_scanned,
        |  (SELECT CAST(sum(size) AS BIGINT) FROM corpus WHERE size >= 1)
        |    AS bytes_scanned,
        |  (SELECT count(*) FROM dupmembers) AS dup_files,
        |  (SELECT count(*) FROM dupsets) AS dup_sets,
        |  (SELECT CAST(sum(size) AS BIGINT) FROM dupmembers) AS dup_bytes"""
        .stripMargin)
  )
}
