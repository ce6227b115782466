package graft

/** DuckDB oracle twins for the training-pipeline tier: text analysis, ANN,
  * multimodal metadata, and the events windowed aggregation. Operates on the
  * raw driver tables (documents / embeddings / events), not the corpus.
  */
object OraclePipeline {

  /** Tokens CTE shared by the text queries (parity with
    * TextAnalysis.tokens: split on single space, drop empties). */
  private val tokCte =
    """WITH tok AS (
      |  SELECT doc_id, tok FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |    FROM documents)
      |  WHERE tok <> ''
      |)
      |""".stripMargin

  private val langIdSql: String = {
    // argmax by (score desc, lang asc) — equivalent to TextAnalysis.langId's
    // strict-greater fold (earliest max wins; profiles are lang-sorted)
    val profiles = graft.text.TextAnalysis.LangProfiles
    val scoreCols = profiles.map { case (lang, ws) =>
      val terms = ws.map(w =>
        s"len(list_filter(string_split(text, ' '), t -> t = '$w'))").mkString(" + ")
      s"CAST($terms AS BIGINT) AS s_$lang"
    }.mkString(",\n    ")
    val values = profiles.map { case (lang, _) => s"('$lang', s_$lang)" }.mkString(", ")
    s"""WITH sc AS (
       |  SELECT doc_id, lang,
       |    $scoreCols
       |  FROM documents)
       |SELECT doc_id, lang,
       |  (SELECT l FROM (VALUES $values) AS t(l, s)
       |   ORDER BY s DESC, l LIMIT 1) AS predicted_lang
       |FROM sc""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "q_token_stats" -> (tokCte +
      """SELECT d.doc_id,
        |       CAST(coalesce(t.n, 0) AS BIGINT) AS n_tokens,
        |       CAST(len(regexp_extract_all(d.text,
        |            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
        |         AS n_bpe_tokens
        |FROM documents d
        |LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t
        |  ON d.doc_id = t.doc_id""".stripMargin),

    "q_lang_id" -> langIdSql,

    "q_quality" -> (tokCte.trim.dropRight(1) +
      """), q AS (
        |  SELECT d.doc_id,
        |    CAST(length(d.text) AS BIGINT) AS n_chars,
        |    CAST(coalesce(t.n, 0) AS BIGINT) AS n_tokens,
        |    CAST(coalesce(t.tok_chars, 0) AS BIGINT) AS tok_chars,
        |    CAST(length(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS alpha,
        |    CAST(length(regexp_replace(d.text, '[^0-9]', '', 'g')) AS BIGINT) AS digits,
        |    CAST(length(regexp_replace(d.text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS punct,
        |    CAST(coalesce(s.stops, 0) AS BIGINT) AS stops
        |  FROM documents d
        |  LEFT JOIN (SELECT doc_id, count(*) AS n, sum(length(tok)) AS tok_chars
        |             FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id
        |  LEFT JOIN (SELECT doc_id, count(*) AS stops FROM tok
        |             WHERE tok IN ('the','a','of','to','and','in','is')
        |             GROUP BY doc_id) s ON d.doc_id = s.doc_id
        |)
        |SELECT doc_id, n_chars, n_tokens,
        |  floor(CAST(tok_chars AS DOUBLE) / greatest(n_tokens, 1) * 1000000) / 1000000 AS avg_token_len,
        |  floor(CAST(alpha AS DOUBLE) / n_chars * 1000000) / 1000000 AS alpha_ratio,
        |  floor(CAST(digits AS DOUBLE) / n_chars * 1000000) / 1000000 AS digit_ratio,
        |  floor(CAST(punct AS DOUBLE) / n_chars * 1000000) / 1000000 AS punct_ratio,
        |  floor(CAST(stops AS DOUBLE) / greatest(n_tokens, 1) * 1000000) / 1000000 AS stopword_ratio,
        |  floor((floor(CAST(alpha AS DOUBLE) / n_chars * 1000000) / 1000000 * 0.5
        |      + (1.0 - floor(CAST(digits AS DOUBLE) / n_chars * 1000000) / 1000000) * 0.2
        |      + (1.0 - floor(CAST(punct AS DOUBLE) / n_chars * 1000000) / 1000000) * 0.2
        |      + least(floor(CAST(stops AS DOUBLE) / greatest(n_tokens, 1) * 1000000) / 1000000 * 2.0,
        |              1.0) * 0.1) * 1000000) / 1000000 AS quality_score
        |FROM q""".stripMargin),

    "q_fingerprint" ->
      """SELECT doc_id,
        |  min((CAST(ascii(substr(text, CAST(i AS INT)    , 1)) AS BIGINT) * 4294967296 +
        |       CAST(ascii(substr(text, CAST(i AS INT) + 1, 1)) AS BIGINT) * 16777216 +
        |       CAST(ascii(substr(text, CAST(i AS INT) + 2, 1)) AS BIGINT) * 65536 +
        |       CAST(ascii(substr(text, CAST(i AS INT) + 3, 1)) AS BIGINT) * 256 +
        |       CAST(ascii(substr(text, CAST(i AS INT) + 4, 1)) AS BIGINT)) % 2147483647)
        |    AS fp_min,
        |  min(CAST(ascii(substr(text || '________', 1, 1)) % 256 AS BIGINT) * 1 +
        |      CAST(ascii(substr(text || '________', 2, 1)) % 256 AS BIGINT) * 131 +
        |      CAST(ascii(substr(text || '________', 3, 1)) % 256 AS BIGINT) * 17161 +
        |      CAST(ascii(substr(text || '________', 4, 1)) % 256 AS BIGINT) * 2248091 +
        |      CAST(ascii(substr(text || '________', 5, 1)) % 256 AS BIGINT) * 294499921 +
        |      CAST(ascii(substr(text || '________', 6, 1)) % 256 AS BIGINT) * 38579489651 +
        |      CAST(ascii(substr(text || '________', 7, 1)) % 256 AS BIGINT) * 5053913144281 +
        |      CAST(ascii(substr(text || '________', 8, 1)) % 256 AS BIGINT) * 662062621900811)
        |    AS fp_head,
        |  CAST(sum(DISTINCT
        |      (CAST(ascii(substr(text, CAST(i AS INT)    , 1)) AS BIGINT) * 4294967296 +
        |       CAST(ascii(substr(text, CAST(i AS INT) + 1, 1)) AS BIGINT) * 16777216 +
        |       CAST(ascii(substr(text, CAST(i AS INT) + 2, 1)) AS BIGINT) * 65536 +
        |       CAST(ascii(substr(text, CAST(i AS INT) + 3, 1)) AS BIGINT) * 256 +
        |       CAST(ascii(substr(text, CAST(i AS INT) + 4, 1)) AS BIGINT)) % 2147483647)
        |    % 2147483647 AS BIGINT) AS fp_set
        |FROM (SELECT doc_id, text,
        |             unnest(generate_series(1, length(text) - 4)) AS i
        |      FROM documents WHERE length(text) >= 5)
        |GROUP BY doc_id""".stripMargin,

    "q_ann_topk" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        |  FROM embeddings
        |), scored AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         floor(list_dot_product(a.v, b.v) /
        |               sqrt(list_dot_product(a.v, a.v) *
        |                    list_dot_product(b.v, b.v)) * 1000000) / 1000000 AS cos
        |  FROM q a JOIN q b ON a.vec_id < 10 AND a.vec_id <> b.vec_id
        |)
        |SELECT query_id, CAST(row_number() OVER w AS BIGINT) AS rank,
        |       neighbor_id, cos
        |FROM scored
        |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
        |QUALIFY row_number() OVER w <= 5""".stripMargin,

    "q_embed_norms" ->
      """SELECT vec_id, CAST(label AS BIGINT) AS label,
        |  floor(sqrt(list_dot_product(
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))))
        |    * 1000000) / 1000000 AS norm_q
        |FROM embeddings""".stripMargin,

    "q_cosine_pairs" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        |  FROM embeddings
        |)
        |SELECT a.vec_id AS a, b.vec_id AS b,
        |       floor(list_dot_product(a.v, b.v) /
        |             sqrt(list_dot_product(a.v, a.v) *
        |                  list_dot_product(b.v, b.v)) * 1000000) / 1000000 AS cos
        |FROM q a JOIN q b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v) /
        |      sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v))
        |      >= 0.55""".stripMargin,

    "q_events_window" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS window_start,
        |       event_type,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS value_cents,
        |       count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    "q_sessions" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_idx
        |  FROM e
        |)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
        |       CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end
        |FROM s GROUP BY user_id, session_idx""".stripMargin,

    "q_mm_meta" ->
      """SELECT doc_id, 'utf8-blob' AS format,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin
  )
}
