package graft.harness

import graft.sources.Transcripts

/** DuckDB oracle SQL for the ER pipeline harness queries.
  *
  * Replicates, step by step and in the common dialect, exactly what the Spark
  * pipeline computes on the transcripts view (mention extraction → blocking →
  * featurized logistic scoring → argmax antecedent decode → transitive
  * clustering via a recursive CTE → evaluation), so the driver's DuckDB
  * compare is a true independent re-implementation check of every stage
  * (SURVEY.md §5). Floating-point parity notes:
  *  - `jaro_winkler_similarity` (DuckDB) matches [[graft.functions.Sim]]
  *    bit-for-bit (standard algorithm, boost threshold 0.7) — verified
  *    empirically;
  *  - all other features are exact (boolean / integer-ratio) expressions;
  *  - the score is the same left-associated sum in both engines.
  */
object ErOracle {

  private val pronouns =
    graft.pipeline.Mentions.Pronouns.map(p => s"'$p'").mkString(", ")

  /** Must mirror the harness pipeline config in SparkEntry. */
  val MaxBlockSize = 300
  val MaxConvDist = 30
  val SnkPrefixLen = 6
  val Minhashes = 12
  val Bands = 4

  private def headKeySql(col: String): String = {
    val digits = s"regexp_extract($col, '([0-9]+)', 1)"
    val stripped = s"regexp_replace($digits, '^0+', '')"
    s"""CASE WHEN $digits <> ''
       | THEN (CASE WHEN $stripped = '' THEN '0' ELSE $stripped END)
       | ELSE lower($col) END""".stripMargin.replace("\n", "")
  }

  /** CTE chain from `transcripts` through `clusters` + `gold`. */
  val chain: String = {
    val sigCols = (0 until Minhashes)
      .map(i => s"list_min(list_transform(sh, s -> md5('$i:' || s))) AS h$i")
      .mkString(",\n    ")
    val bandKeys = (0 until Bands).map { b =>
      val hs = (0 until Minhashes / Bands).map(r => s"h${b * (Minhashes / Bands) + r}")
      s"SELECT 'l:' || ${(s"'b$b'" +: hs).mkString(" || ':' || ")} AS block_key, mention_id FROM sigs"
    }.mkString("\n  UNION ALL\n  ")

    // weights: keep in sync with graft.pipeline.Scoring.DefaultWeights
    val w = graft.pipeline.Scoring.DefaultWeights
    def wv(n: String) = w(n)

    s"""${Transcripts.cte},
       |toks AS (
       |  SELECT t.conv_id, t.turn_idx,
       |         unnest(string_split(t.text, ' ')) AS tok,
       |         CAST(generate_subscripts(string_split(t.text, ' '), 1) - 1 AS INT) AS pos
       |  FROM transcripts t
       |),
       |ment0 AS (
       |  SELECT conv_id, turn_idx, pos AS start, tok AS surface,
       |         CASE WHEN lower(tok) IN ($pronouns) THEN 'PRONOMINAL' ELSE 'PROPER' END AS mtype,
       |         lower(tok) AS norm
       |  FROM toks
       |  WHERE regexp_matches(tok, '^(?:[A-Za-z]+[#-])?[0-9]+$$') OR lower(tok) IN ($pronouns)
       |),
       |mentions AS MATERIALIZED (
       |  SELECT *,
       |    conv_id || '#' || lpad(CAST(turn_idx AS STRING), 4, '0') || lpad(CAST(start AS STRING), 4, '0') AS mention_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx, start) - 1 AS INT) AS m_seq,
       |    ${headKeySql("surface")} AS head_key,
       |    (mtype = 'PRONOMINAL') AS closed_class
       |  FROM ment0
       |),
       |shing AS (
       |  SELECT mention_id,
       |    CASE WHEN length(norm) < 3 THEN [norm]
       |         ELSE list_transform(range(1, length(norm) - 1), i -> substr(norm, i, 3)) END AS sh
       |  FROM mentions WHERE NOT closed_class
       |),
       |sigs AS (
       |  SELECT mention_id,
       |    $sigCols
       |  FROM shing
       |),
       |bkeys AS (
       |  SELECT 'h:' || head_key AS block_key, mention_id FROM mentions WHERE NOT closed_class
       |  UNION ALL
       |  SELECT 's:' || substr(regexp_replace(norm, '[^a-z0-9]', '', 'g'), 1, $SnkPrefixLen) AS block_key, mention_id
       |  FROM mentions WHERE NOT closed_class
       |  UNION ALL
       |  SELECT 'f:' || string_split(norm, ' ')[1] AS block_key, mention_id
       |  FROM mentions WHERE NOT closed_class
       |  UNION ALL
       |  SELECT 'a:' || acro AS block_key, mention_id FROM (
       |    SELECT mention_id,
       |      CASE WHEN len(string_split(norm, ' ')) > 1
       |           THEN array_to_string(list_transform(string_split(norm, ' '), t -> substr(t, 1, 1)), '')
       |           WHEN length(norm) <= 5 THEN norm END AS acro
       |    FROM mentions WHERE NOT closed_class)
       |  WHERE acro IS NOT NULL AND length(acro) > 1
       |  UNION ALL
       |  $bandKeys
       |),
       |bstats AS (SELECT block_key, count(*) AS n_mentions FROM bkeys GROUP BY block_key),
       |bkeys_ok AS (
       |  SELECT b.block_key, b.mention_id FROM bkeys b
       |  JOIN bstats s ON b.block_key = s.block_key WHERE s.n_mentions <= $MaxBlockSize
       |),
       |pairs AS MATERIALIZED (
       |  SELECT ant_id, cur_id, min(block_key) AS block_key FROM (
       |    SELECT a.mention_id AS ant_id, c.mention_id AS cur_id, 'conv' AS block_key
       |    FROM mentions a JOIN mentions c ON a.conv_id = c.conv_id
       |      AND c.m_seq > a.m_seq AND c.m_seq - a.m_seq <= $MaxConvDist
       |    UNION ALL
       |    SELECT l.mention_id AS ant_id, r.mention_id AS cur_id, l.block_key
       |    FROM bkeys_ok l JOIN bkeys_ok r ON l.block_key = r.block_key
       |      AND l.mention_id < r.mention_id
       |  ) GROUP BY ant_id, cur_id
       |),
       |scored AS (
       |  SELECT p.ant_id, p.cur_id, p.block_key,
       |    a.conv_id AS conv_id_a, c.conv_id AS conv_id_c,
       |    CASE WHEN a.head_key = c.head_key THEN 1.0 ELSE 0.0 END AS f_head_match,
       |    CASE WHEN a.norm = c.norm THEN 1.0 ELSE 0.0 END AS f_exact_match,
       |    CASE WHEN (NOT a.closed_class) AND (NOT c.closed_class)
       |          AND (contains(a.norm, c.norm) OR contains(c.norm, a.norm))
       |          AND a.norm <> c.norm THEN 1.0 ELSE 0.0 END AS f_containment,
       |    CASE WHEN a.norm = c.norm THEN 1.0 ELSE 0.0 END AS f_token_jaccard,
       |    jaro_winkler_similarity(a.norm, c.norm) AS f_jaro_winkler,
       |    1.0 - CAST(levenshtein(a.norm, c.norm) AS DOUBLE)
       |        / CAST(greatest(length(a.norm), length(c.norm)) AS DOUBLE) AS f_lev_sim,
       |    CASE WHEN a.norm = substr(c.norm, 1, 1) OR c.norm = substr(a.norm, 1, 1)
       |         THEN 1.0 ELSE 0.0 END AS f_abbrev,
       |    CASE WHEN c.closed_class AND a.conv_id = c.conv_id
       |          AND c.m_seq - a.m_seq <= 10 AND c.m_seq - a.m_seq > 0
       |         THEN 1.0 ELSE 0.0 END AS f_anaphoric_close,
       |    CASE WHEN c.closed_class THEN 1.0 ELSE 0.0 END AS f_closed_cur,
       |    CASE WHEN a.conv_id = c.conv_id
       |         THEN 1.0 / (1.0 + CAST(c.m_seq - a.m_seq AS DOUBLE)) ELSE 0.0 END AS f_dist_decay,
       |    (NOT a.closed_class) AND (NOT c.closed_class) AS open_pair
       |  FROM pairs p
       |  JOIN mentions a ON p.ant_id = a.mention_id
       |  JOIN mentions c ON p.cur_id = c.mention_id
       |),
       |scored2 AS MATERIALIZED (
       |  SELECT *,
       |    ${wv("bias")}
       |    + (CASE WHEN open_pair THEN f_head_match ELSE 0.0 END) * ${wv("head_match")}
       |    + (CASE WHEN open_pair THEN f_exact_match ELSE 0.0 END) * ${wv("exact_match")}
       |    + (CASE WHEN open_pair THEN f_containment ELSE 0.0 END) * ${wv("containment")}
       |    + (CASE WHEN open_pair THEN f_token_jaccard ELSE 0.0 END) * ${wv("token_jaccard")}
       |    + (CASE WHEN open_pair THEN f_jaro_winkler ELSE 0.0 END) * ${wv("jaro_winkler")}
       |    + (CASE WHEN open_pair THEN f_lev_sim ELSE 0.0 END) * ${wv("lev_sim")}
       |    + (CASE WHEN open_pair THEN f_abbrev ELSE 0.0 END) * ${wv("abbrev")}
       |    + f_anaphoric_close * ${wv("anaphoric_close")}
       |    + f_closed_cur * ${wv("closed_cur")}
       |    + f_dist_decay * ${wv("dist_decay")} AS score
       |  FROM scored
       |),
       |backptrs AS MATERIALIZED (
       |  SELECT cur_id, ant_id, score FROM (
       |    SELECT cur_id, ant_id, score,
       |      ROW_NUMBER() OVER (PARTITION BY cur_id ORDER BY score DESC, ant_id ASC) AS rk
       |    FROM scored2 WHERE score > 0.0
       |  ) WHERE rk = 1
       |),
       |-- every backpointer edge points to a lexicographically smaller id, so
       |-- components are parent-trees: the cluster id (component min) is the
       |-- root reached by chasing ancestors — much cheaper than full closure.
       |anc AS (
       |  SELECT cur_id AS id, ant_id AS anc FROM backptrs
       |  UNION
       |  SELECT a.id, b.ant_id AS anc FROM anc a JOIN backptrs b ON a.anc = b.cur_id
       |),
       |clusters AS MATERIALIZED (
       |  SELECT m.mention_id, coalesce(min(a.anc), m.mention_id) AS cluster_id
       |  FROM mentions m LEFT JOIN anc a ON m.mention_id = a.id
       |  GROUP BY m.mention_id
       |),
       |gold AS MATERIALIZED (
       |  SELECT mention_id, regexp_extract(conv_id, '^c([0-9]+)-', 1) AS entity_id FROM mentions
       |)""".stripMargin
  }

  /** Full oracle query: recursive-CTE prefix + body. */
  def q(body: String): String = s"WITH RECURSIVE $chain\n$body"
}
