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
  val MaxBlockMass = 2000
  val MaxConvDist = 30
  val SnkPrefixLen = 6
  val Minhashes = 12
  val Bands = 4
  val ExpansionSalt = 8
  val SaltThreshold = 64
  val MaxSelfMentions = 100000

  /** F11 semantic class of a lowercased token — mirrors
    * graft.functions.semClass (shared by `f7_f11_properties` and the sparse
    * feature CTEs). */
  def semClassSql(tok: String): String = {
    val noms = graft.pipeline.Mentions.NominalHeads.map(h => s"'$h'").mkString(", ")
    s"""CASE WHEN regexp_matches($tok, '^[0-9]+$$') OR regexp_matches($tok, '^[a-z]+[#-][0-9]+$$') THEN 'IDENT'
       | WHEN $tok IN ($pronouns) THEN 'PRON'
       | WHEN $tok IN ($noms) THEN 'ORG'
       | WHEN regexp_matches($tok, '(corp|systems|labs|holdings|partners|group|works|networks|industries|dynamics|solutions|ventures)$$') THEN 'ORG'
       | ELSE 'OTHER' END""".stripMargin.replace("\n", "")
  }

  private def headKeySql(col: String): String = {
    val digits = s"regexp_extract($col, '([0-9]+)', 1)"
    val stripped = s"regexp_replace($digits, '^0+', '')"
    s"""CASE WHEN $digits <> ''
       | THEN (CASE WHEN $stripped = '' THEN '0' ELSE $stripped END)
       | ELSE lower($col) END""".stripMargin.replace("\n", "")
  }

  // -- shared chain components (both engines' harness configs) --------------

  private val sigCols: String = (0 until Minhashes)
    .map(i => s"list_min(list_transform(sh, s -> md5('$i:' || s))) AS h$i")
    .mkString(",\n    ")
  private val bandKeysSql: String = (0 until Bands).map { b =>
    val hs = (0 until Minhashes / Bands).map(r => s"h${b * (Minhashes / Bands) + r}")
    s"SELECT 'l:' || ${(s"'b$b'" +: hs).mkString(" || ':' || ")} AS block_key, norm FROM sigs"
  }.mkString("\n  UNION ALL\n  ")
  // weights: keep in sync with graft.pipeline.Scoring.DefaultWeights
  private def wv(n: String): Double = graft.pipeline.Scoring.DefaultWeights(n)

  private val toksSql: String =
    s"""toks AS (
       |  SELECT t.conv_id, t.turn_idx, t.role,
       |         unnest(string_split(t.text, ' ')) AS tok,
       |         CAST(generate_subscripts(string_split(t.text, ' '), 1) - 1 AS INT) AS pos
       |  FROM transcripts t
       |)""".stripMargin

  /** Identifier+pronoun mention extraction (the harness execution path). */
  private val mentionsIdentSql: String =
    s"""ment0 AS (
       |  SELECT conv_id, turn_idx, role, pos AS start, tok AS surface,
       |         CASE WHEN lower(tok) IN ($pronouns) THEN 'PRONOMINAL' ELSE 'PROPER' END AS mtype,
       |         lower(tok) AS norm
       |  FROM toks
       |  WHERE regexp_matches(tok, '^(?:[A-Za-z]+[#-])?[0-9]+$$') OR lower(tok) IN ($pronouns)
       |),
       |mentions AS MATERIALIZED (
       |  SELECT *,
       |    CASE WHEN mtype = 'PRONOMINAL'
       |         THEN (CASE WHEN norm IN ('they', 'them') THEN 'plural' ELSE 'singular' END)
       |         WHEN mtype = 'NOMINAL'
       |         THEN (CASE WHEN norm LIKE '%s' THEN 'plural' ELSE 'singular' END)
       |         ELSE 'unknown' END AS number,
       |    CASE WHEN norm IN ('he', 'him') THEN 'male'
       |         WHEN norm IN ('she', 'her') THEN 'female'
       |         WHEN mtype = 'PRONOMINAL' THEN 'neutral'
       |         ELSE 'unknown' END AS gender,
       |    conv_id || '#' || lpad(CAST(turn_idx AS STRING), 6, '0') || lpad(CAST(start AS STRING), 6, '0') AS mention_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx, start) - 1 AS INT) AS m_seq,
       |    ${headKeySql("surface")} AS head_key,
       |    (mtype = 'PRONOMINAL') AS closed_class
       |  FROM ment0
       |)""".stripMargin

  /** All-generators mention extraction — capitalized runs, pronouns,
    * determiner+nominal, extent dedup, M2 non-maximal filter, per-start id
    * uniqueness — mirrors graft.pipeline.Mentions.extractAll exactly. */
  private val mentionsAllSql: String = {
    val nominalHeads = graft.pipeline.Mentions.NominalHeads.map(h => s"'$h'").mkString(", ")
    s"""caps AS (
       |  SELECT conv_id, turn_idx, role, pos, tok,
       |    pos - ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx ORDER BY pos) AS grp
       |  FROM toks
       |  WHERE regexp_matches(tok, '^[A-Z0-9][A-Za-z0-9#-]*$$')
       |    AND lower(tok) NOT IN ($pronouns)
       |    AND (pos > 0 OR regexp_matches(tok, '^(?:[A-Za-z]+[#-])?[0-9]+$$'))
       |),
       |capruns AS (
       |  SELECT conv_id, turn_idx, CAST(min(pos) AS INT) AS start, CAST(max(pos) AS INT) AS "end",
       |    string_agg(tok, ' ' ORDER BY pos) AS surface, min(role) AS role,
       |    'PROPER' AS mtype
       |  FROM caps GROUP BY conv_id, turn_idx, grp
       |),
       |prons AS (
       |  SELECT conv_id, turn_idx, pos AS start, pos AS "end", tok AS surface, role,
       |    'PRONOMINAL' AS mtype
       |  FROM toks WHERE lower(tok) IN ($pronouns)
       |),
       |nomsrc AS (
       |  SELECT conv_id, turn_idx, pos, role, tok,
       |    lag(lower(tok)) OVER (PARTITION BY conv_id, turn_idx ORDER BY pos) AS prev
       |  FROM toks
       |),
       |noms AS (
       |  SELECT conv_id, turn_idx, CAST(pos - 1 AS INT) AS start, pos AS "end",
       |    prev || ' ' || tok AS surface, role, 'NOMINAL' AS mtype
       |  FROM nomsrc
       |  WHERE lower(tok) IN ($nominalHeads) AND prev IN ('the', 'that', 'this')
       |),
       |allm AS (
       |  SELECT * FROM capruns UNION ALL SELECT * FROM prons UNION ALL SELECT * FROM noms
       |),
       |dedupm AS (
       |  SELECT * FROM allm
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx, start, "end" ORDER BY mtype) = 1
       |),
       |m2f AS (
       |  SELECT * FROM dedupm
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx, "end" ORDER BY start ASC, mtype) = 1
       |),
       |uniqm AS (
       |  SELECT * FROM m2f
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx, start ORDER BY "end" DESC, mtype) = 1
       |),
       |mentions AS MATERIALIZED (
       |  SELECT *, ${headKeySql("string_split(norm, ' ')[len(string_split(norm, ' '))]")} AS head_key,
       |    CASE WHEN mtype = 'PRONOMINAL'
       |         THEN (CASE WHEN norm IN ('they', 'them') THEN 'plural' ELSE 'singular' END)
       |         WHEN mtype = 'NOMINAL'
       |         THEN (CASE WHEN norm LIKE '%s' THEN 'plural' ELSE 'singular' END)
       |         ELSE 'unknown' END AS number,
       |    CASE WHEN norm IN ('he', 'him') THEN 'male'
       |         WHEN norm IN ('she', 'her') THEN 'female'
       |         WHEN mtype = 'PRONOMINAL' THEN 'neutral'
       |         ELSE 'unknown' END AS gender
       |  FROM (
       |    SELECT *, lower(trim(surface)) AS norm,
       |      conv_id || '#' || lpad(CAST(turn_idx AS STRING), 6, '0') || lpad(CAST(start AS STRING), 6, '0') AS mention_id,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx, start, "end") - 1 AS INT) AS m_seq,
       |      (mtype IN ('PRONOMINAL', 'NOMINAL')) AS closed_class
       |    FROM uniqm
       |  )
       |)""".stripMargin
  }

  /** Blocking + surface scoring over whatever `mentions` CTE precedes it. */
  private val blockingSql: String =
    s"""surfaces AS MATERIALIZED (
       |  SELECT norm, string_split(norm, ' ') AS toks,
       |    ${headKeySql("string_split(norm, ' ')[len(string_split(norm, ' '))]")} AS head_key
       |  FROM (SELECT DISTINCT norm FROM mentions WHERE NOT closed_class)
       |),
       |shing AS (
       |  SELECT norm,
       |    CASE WHEN length(norm) < 3 THEN [norm]
       |         ELSE list_transform(range(1, length(norm) - 1), i -> substr(norm, i, 3)) END AS sh
       |  FROM surfaces
       |),
       |sigs AS (
       |  SELECT norm,
       |    $sigCols
       |  FROM shing
       |),
       |bkeys AS (
       |  SELECT 'h:' || head_key AS block_key, norm FROM surfaces
       |  UNION ALL
       |  SELECT 's:' || substr(regexp_replace(norm, '[^a-z0-9]', '', 'g'), 1, $SnkPrefixLen) AS block_key, norm
       |  FROM surfaces
       |  UNION ALL
       |  SELECT 'f:' || string_split(norm, ' ')[1] AS block_key, norm FROM surfaces
       |  UNION ALL
       |  SELECT 'a:' || acro AS block_key, norm FROM (
       |    SELECT norm,
       |      CASE WHEN len(string_split(norm, ' ')) > 1
       |           THEN array_to_string(list_transform(string_split(norm, ' '), t -> substr(t, 1, 1)), '')
       |           WHEN length(norm) <= 5 THEN norm END AS acro
       |    FROM surfaces)
       |  WHERE acro IS NOT NULL AND length(acro) > 1
       |  UNION ALL
       |  $bandKeysSql
       |),
       |scounts AS (
       |  SELECT norm, CAST(count(*) AS BIGINT) AS n_mentions
       |  FROM mentions WHERE NOT closed_class GROUP BY norm
       |),
       |bstats AS (
       |  SELECT b.block_key, count(*) AS n_surfaces, SUM(sc.n_mentions) AS mention_mass
       |  FROM bkeys b JOIN scounts sc ON b.norm = sc.norm
       |  GROUP BY b.block_key
       |),
       |bkeys_ok AS (
       |  SELECT b.block_key, b.norm FROM bkeys b
       |  JOIN bstats s ON b.block_key = s.block_key
       |  WHERE s.n_surfaces <= $MaxBlockSize AND s.mention_mass <= $MaxBlockMass
       |),
       |spairs AS MATERIALIZED (
       |  SELECT norm_a, norm_b, min(block_key) AS block_key FROM (
       |    SELECT l.norm AS norm_a, r.norm AS norm_b, l.block_key
       |    FROM bkeys_ok l JOIN bkeys_ok r ON l.block_key = r.block_key
       |      AND l.norm < r.norm
       |  ) GROUP BY norm_a, norm_b
       |),
       |sscored AS MATERIALIZED (
       |  SELECT p.norm_a, p.norm_b, p.block_key,
       |    f_head_match, f_exact_match, f_containment, f_token_jaccard,
       |    f_jaro_winkler, f_lev_sim, f_abbrev,
       |    ${wv("bias")}
       |    + f_head_match * ${wv("head_match")}
       |    + f_exact_match * ${wv("exact_match")}
       |    + f_containment * ${wv("containment")}
       |    + f_token_jaccard * ${wv("token_jaccard")}
       |    + f_jaro_winkler * ${wv("jaro_winkler")}
       |    + f_lev_sim * ${wv("lev_sim")}
       |    + f_abbrev * ${wv("abbrev")} AS score
       |  FROM (
       |    SELECT p.norm_a, p.norm_b, p.block_key,
       |      CASE WHEN a.head_key = c.head_key THEN 1.0 ELSE 0.0 END AS f_head_match,
       |      CASE WHEN a.norm = c.norm THEN 1.0 ELSE 0.0 END AS f_exact_match,
       |      CASE WHEN (contains(a.norm, c.norm) OR contains(c.norm, a.norm))
       |            AND a.norm <> c.norm THEN 1.0 ELSE 0.0 END AS f_containment,
       |      CAST(len(list_intersect(list_distinct(a.toks), list_distinct(c.toks))) AS DOUBLE)
       |        / (len(list_distinct(a.toks)) + len(list_distinct(c.toks))
       |           - len(list_intersect(list_distinct(a.toks), list_distinct(c.toks)))) AS f_token_jaccard,
       |      jaro_winkler_similarity(a.norm, c.norm) AS f_jaro_winkler,
       |      1.0 - CAST(levenshtein(a.norm, c.norm) AS DOUBLE)
       |          / CAST(greatest(length(a.norm), length(c.norm)) AS DOUBLE) AS f_lev_sim,
       |      CASE WHEN a.norm = array_to_string(list_transform(c.toks, t -> substr(t, 1, 1)), '')
       |            OR c.norm = array_to_string(list_transform(a.toks, t -> substr(t, 1, 1)), '')
       |           THEN 1.0 ELSE 0.0 END AS f_abbrev
       |    FROM spairs p
       |    JOIN surfaces a ON p.norm_a = a.norm
       |    JOIN surfaces c ON p.norm_b = c.norm
       |  ) p
       |)""".stripMargin

  /** Band scoring, chains/bridge expansion, decode, clustering, gold. */
  private val decodeSql: String =
    s"""bandp AS (
       |  SELECT a.mention_id AS ant_id, c.mention_id AS cur_id, 'conv' AS block_key,
       |    a.norm AS norm_a, c.norm AS norm_c, a.head_key AS hk_a, c.head_key AS hk_c,
       |    a.closed_class AS cc_a, c.closed_class AS cc_c,
       |    a.role AS role_a, c.role AS role_c,
       |    a.number AS number_a, c.number AS number_c,
       |    a.gender AS gender_a, c.gender AS gender_c,
       |    c.m_seq - a.m_seq AS dist
       |  FROM mentions a JOIN mentions c ON a.conv_id = c.conv_id
       |    AND c.m_seq > a.m_seq AND c.m_seq - a.m_seq <= $MaxConvDist
       |),
       |bscored AS (
       |  SELECT ant_id, cur_id, block_key,
       |    f_head_match, f_exact_match, f_containment, f_token_jaccard,
       |    f_jaro_winkler, f_lev_sim, f_abbrev, f_anaphoric_close,
       |    f_closed_cur, f_dist_decay, f_same_role, f_number_match,
       |    f_number_clash, f_gender_match, f_gender_clash,
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
       |    + f_dist_decay * ${wv("dist_decay")}
       |    + f_same_role * ${wv("same_role")}
       |    + f_number_match * ${wv("number_match")}
       |    + f_number_clash * ${wv("number_clash")}
       |    + f_gender_match * ${wv("gender_match")}
       |    + f_gender_clash * ${wv("gender_clash")} AS score
       |  FROM (
       |    SELECT ant_id, cur_id, block_key,
       |      CASE WHEN hk_a = hk_c THEN 1.0 ELSE 0.0 END AS f_head_match,
       |      CASE WHEN norm_a = norm_c THEN 1.0 ELSE 0.0 END AS f_exact_match,
       |      CASE WHEN (NOT cc_a) AND (NOT cc_c)
       |            AND (contains(norm_a, norm_c) OR contains(norm_c, norm_a))
       |            AND norm_a <> norm_c THEN 1.0 ELSE 0.0 END AS f_containment,
       |      CASE WHEN norm_a = norm_c THEN 1.0 ELSE 0.0 END AS f_token_jaccard,
       |      jaro_winkler_similarity(norm_a, norm_c) AS f_jaro_winkler,
       |      1.0 - CAST(levenshtein(norm_a, norm_c) AS DOUBLE)
       |          / CAST(greatest(length(norm_a), length(norm_c)) AS DOUBLE) AS f_lev_sim,
       |      CASE WHEN norm_a = substr(norm_c, 1, 1) OR norm_c = substr(norm_a, 1, 1)
       |           THEN 1.0 ELSE 0.0 END AS f_abbrev,
       |      CASE WHEN cc_c AND dist <= 10 AND dist > 0 THEN 1.0 ELSE 0.0 END AS f_anaphoric_close,
       |      CASE WHEN cc_c THEN 1.0 ELSE 0.0 END AS f_closed_cur,
       |      1.0 / (1.0 + CAST(dist AS DOUBLE)) AS f_dist_decay,
       |      CASE WHEN role_a = role_c THEN 1.0 ELSE 0.0 END AS f_same_role,
       |      CASE WHEN number_a <> 'unknown' AND number_c <> 'unknown'
       |            AND number_a = number_c THEN 1.0 ELSE 0.0 END AS f_number_match,
       |      CASE WHEN number_a <> 'unknown' AND number_c <> 'unknown'
       |            AND number_a <> number_c THEN 1.0 ELSE 0.0 END AS f_number_clash,
       |      CASE WHEN gender_a <> 'unknown' AND gender_c <> 'unknown'
       |            AND gender_a = gender_c THEN 1.0 ELSE 0.0 END AS f_gender_match,
       |      CASE WHEN gender_a <> 'unknown' AND gender_c <> 'unknown'
       |            AND gender_a <> gender_c THEN 1.0 ELSE 0.0 END AS f_gender_clash,
       |      (NOT cc_a) AND (NOT cc_c) AS open_pair
       |    FROM bandp
       |  )
       |),
       |-- surface self score: what the model assigns an exact-match pair of
       |-- this surface (all similarity features identically 1.0, containment
       |-- 0, abbrev only when the surface equals its own initials)
       |sself AS (
       |  SELECT s.norm,
       |    ${wv("bias")}
       |    + 1.0 * ${wv("head_match")}
       |    + 1.0 * ${wv("exact_match")}
       |    + 0.0 * ${wv("containment")}
       |    + 1.0 * ${wv("token_jaccard")}
       |    + 1.0 * ${wv("jaro_winkler")}
       |    + 1.0 * ${wv("lev_sim")}
       |    + (CASE WHEN s.norm = array_to_string(list_transform(s.toks, t -> substr(t, 1, 1)), '')
       |       THEN 1.0 ELSE 0.0 END) * ${wv("abbrev")} AS score
       |  FROM surfaces s JOIN scounts sc ON s.norm = sc.norm
       |  WHERE sc.n_mentions >= 2
       |),
       |-- same-surface spanning chains (bucketed two-level for heavy surfaces)
       |chainsrc AS (
       |  SELECT m.mention_id, m.conv_id, m.m_seq, m.norm,
       |    CASE WHEN sc.n_mentions > $SaltThreshold
       |      THEN (instr('0123456789abcdef', substr(md5(m.mention_id), 1, 1)) - 1) % $ExpansionSalt
       |      ELSE 0 END AS salt
       |  FROM mentions m JOIN scounts sc ON m.norm = sc.norm
       |  WHERE NOT m.closed_class AND sc.n_mentions >= 2
       |),
       |chain1 AS (
       |  SELECT norm,
       |    lag(mention_id) OVER w1 AS ant_id, mention_id AS cur_id,
       |    lag(conv_id) OVER w1 AS conv_a, conv_id AS conv_c,
       |    lag(m_seq) OVER w1 AS seq_a, m_seq AS seq_c
       |  FROM chainsrc
       |  WINDOW w1 AS (PARTITION BY norm, salt ORDER BY mention_id)
       |),
       |bmin AS (
       |  SELECT norm, salt, min(mention_id) AS mention_id FROM chainsrc GROUP BY norm, salt
       |),
       |chain2 AS (
       |  SELECT b.norm,
       |    lag(b.mention_id) OVER w2 AS ant_id, b.mention_id AS cur_id,
       |    lag(m.conv_id) OVER w2 AS conv_a, m.conv_id AS conv_c,
       |    lag(m.m_seq) OVER w2 AS seq_a, m.m_seq AS seq_c
       |  FROM bmin b JOIN mentions m ON b.mention_id = m.mention_id
       |  WINDOW w2 AS (PARTITION BY b.norm ORDER BY b.mention_id)
       |),
       |chains AS (
       |  SELECT ch.ant_id, ch.cur_id, 'x:self' AS block_key, s.score
       |  FROM (SELECT * FROM chain1 UNION ALL SELECT * FROM chain2) ch
       |  JOIN sself s ON ch.norm = s.norm
       |  WHERE ch.ant_id IS NOT NULL
       |    AND NOT (ch.conv_a = ch.conv_c AND abs(ch.seq_a - ch.seq_c) <= $MaxConvDist)
       |),
       |-- bridge expansion: ONE edge per linked surface pair, between the two
       |-- surfaces' minimum mentions (same components as the full clique —
       |-- every clique edge carries the identical surface-level score)
       |smin AS (
       |  SELECT sm.norm, sm.mention_id, m.conv_id, m.m_seq
       |  FROM (SELECT norm, min(mention_id) AS mention_id
       |        FROM mentions WHERE NOT closed_class GROUP BY norm) sm
       |  JOIN mentions m ON sm.mention_id = m.mention_id
       |),
       |globalx AS (
       |  SELECT least(a.mention_id, b.mention_id) AS ant_id,
       |         greatest(a.mention_id, b.mention_id) AS cur_id,
       |         s.block_key, s.score
       |  FROM (SELECT * FROM sscored WHERE score > 0.0) s
       |  JOIN smin a ON s.norm_a = a.norm
       |  JOIN smin b ON s.norm_b = b.norm
       |  WHERE NOT (a.conv_id = b.conv_id AND abs(a.m_seq - b.m_seq) <= $MaxConvDist)
       |),
       |scoredall AS MATERIALIZED (
       |  SELECT ant_id, cur_id, block_key, score FROM bscored
       |  UNION ALL
       |  SELECT ant_id, cur_id, block_key, score FROM globalx
       |  UNION ALL
       |  SELECT ant_id, cur_id, block_key, score FROM chains
       |),
       |backptrs AS MATERIALIZED (
       |  SELECT cur_id, ant_id, score FROM (
       |    SELECT cur_id, ant_id, score,
       |      ROW_NUMBER() OVER (PARTITION BY cur_id ORDER BY score DESC, ant_id ASC) AS rk
       |    FROM scoredall WHERE score > 0.0
       |  ) WHERE rk = 1
       |),
       |cpairs AS (
       |  SELECT ant_id, cur_id, min(block_key) AS block_key FROM (
       |    SELECT ant_id, cur_id, block_key FROM bandp
       |    UNION ALL
       |    SELECT least(ma.mention_id, mb.mention_id) AS ant_id,
       |           greatest(ma.mention_id, mb.mention_id) AS cur_id, s.block_key
       |    FROM spairs s
       |    JOIN mentions ma ON ma.norm = s.norm_a AND NOT ma.closed_class
       |    JOIN mentions mb ON mb.norm = s.norm_b AND NOT mb.closed_class
       |    WHERE NOT (ma.conv_id = mb.conv_id AND abs(ma.m_seq - mb.m_seq) <= $MaxConvDist)
       |    UNION ALL
       |    -- same-surface cliques: two mentions of one normalized surface
       |    -- share every blocking key by construction (capped + audited for
       |    -- ultra-heavy surfaces)
       |    SELECT ma.mention_id AS ant_id, mb.mention_id AS cur_id, 'x:self' AS block_key
       |    FROM mentions ma
       |    JOIN mentions mb ON ma.norm = mb.norm AND ma.mention_id < mb.mention_id
       |    JOIN scounts sc ON ma.norm = sc.norm
       |    WHERE NOT ma.closed_class AND NOT mb.closed_class
       |      AND sc.n_mentions <= $MaxSelfMentions
       |      AND NOT (ma.conv_id = mb.conv_id AND abs(ma.m_seq - mb.m_seq) <= $MaxConvDist)
       |  ) GROUP BY ant_id, cur_id
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

  /** CTE chain from `transcripts` through `clusters` + `gold`. */
  val chain: String =
    s"${Transcripts.cte},\n$toksSql,\n$mentionsIdentSql,\n$blockingSql,\n$decodeSql"

  /** CTE chain for the all-generators path, through `sscored`. */
  val allChain: String =
    s"${Transcripts.cte},\n$toksSql,\n$mentionsAllSql,\n$blockingSql"


  /** Entity-linking CTEs (L1-L4 + F12), appended to a chain body. Mirrors
    * graft.linking.Linking + the customer-derived dictionary in
    * graft.harness.Queries.linkDict. */
  val linkingCtes: String =
    s""",
       |ldict AS (
       |  SELECT lower(c_name) AS surface, 'Customer_' || CAST(c_custkey AS STRING) AS title, 10 AS cnt FROM customer
       |  UNION ALL
       |  SELECT substr(lower(c_name), 10, 9), 'Customer_' || CAST(c_custkey AS STRING), 5 FROM customer
       |  UNION ALL
       |  SELECT 'cust-' || CAST(c_custkey AS STRING), 'Cust_' || CAST(c_custkey AS STRING), 3 FROM customer
       |  UNION ALL
       |  SELECT CAST(c_custkey AS STRING), 'Customer_' || CAST(c_custkey AS STRING), 1 FROM customer
       |),
       |lred AS (
       |  SELECT 'Cust_' || CAST(c_custkey AS STRING) AS src,
       |         'Customer_' || CAST(c_custkey AS STRING) AS dst FROM customer
       |),
       |lheads AS (
       |  SELECT mention_id, norm,
       |    string_split(norm, ' ')[len(string_split(norm, ' '))] AS head_q
       |  FROM mentions
       |),
       |lqueries AS (
       |  SELECT mention_id, query, min(prio) AS prio FROM (
       |    SELECT mention_id, norm AS query, 0 AS prio FROM mentions
       |    UNION ALL
       |    SELECT mention_id,
       |      CASE WHEN norm LIKE 'the %' OR norm LIKE 'a %' OR norm LIKE 'an %'
       |           THEN substr(norm, instr(norm, ' ') + 1) ELSE norm END, 1
       |    FROM mentions
       |    UNION ALL
       |    SELECT mention_id, head_q, 2 FROM lheads
       |    UNION ALL
       |    SELECT mention_id,
       |      CASE WHEN head_q LIKE '%''s' THEN substr(head_q, 1, length(head_q) - 2)
       |           WHEN head_q LIKE '%s' AND length(head_q) > 3 THEN substr(head_q, 1, length(head_q) - 1)
       |           ELSE head_q END, 3
       |    FROM lheads
       |  ) GROUP BY mention_id, query
       |),
       |lhits AS (
       |  SELECT q.mention_id, q.prio, d.title, d.cnt
       |  FROM lqueries q JOIN ldict d ON q.query = d.surface
       |),
       |lbest AS (
       |  SELECT mention_id, title AS title0, prio, cnt FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY mention_id
       |      ORDER BY prio ASC, cnt DESC, title ASC) AS rk FROM lhits
       |  ) WHERE rk = 1
       |),
       |llinks AS (
       |  SELECT b.mention_id, coalesce(r.dst, b.title0) AS title, b.prio, b.cnt
       |  FROM lbest b LEFT JOIN lred r ON b.title0 = r.src
       |)""".stripMargin

  /** L4/L5 CTEs (appended after [[linkingCtes]]): poisoned dictionary +
    * aux-purge set + latent query/denotation chooser grid — mirrors
    * graft.linking.Linking.queryDenotationChoose over
    * graft.harness.Queries.linkDictPoisoned. */
  val linkingL5Ctes: String =
    s""",
       |ljunk AS (
       |  SELECT lower(c_name) AS surface, 'Disambig_' || CAST(c_custkey AS STRING) AS title, 99 AS cnt
       |  FROM customer WHERE c_custkey % 3 = 0
       |),
       |laux AS (
       |  SELECT 'Disambig_' || CAST(c_custkey AS STRING) AS title
       |  FROM customer WHERE c_custkey % 3 = 0
       |),
       |l5hits AS (
       |  SELECT q.mention_id, q.prio, d.title, d.cnt
       |  FROM lqueries q
       |  JOIN (SELECT * FROM ldict UNION ALL SELECT * FROM ljunk) d ON q.query = d.surface
       |),
       |l5purged AS (
       |  SELECT h.* FROM l5hits h
       |  WHERE NOT EXISTS (SELECT 1 FROM laux a WHERE a.title = h.title)
       |),
       |l5scored AS (
       |  SELECT mention_id, title,
       |    CAST(3 - prio AS DOUBLE) * 1.0 + ln(CAST(greatest(cnt, 1) AS DOUBLE)) * 0.5 AS dscore
       |  FROM l5purged
       |),
       |l5choice AS (
       |  SELECT mention_id, title AS title0, dscore FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY mention_id
       |      ORDER BY dscore DESC, title ASC) AS rk
       |    FROM l5scored) WHERE rk = 1
       |),
       |l5links AS (
       |  SELECT c.mention_id, coalesce(r.dst, c.title0) AS title, c.dscore
       |  FROM l5choice c LEFT JOIN lred r ON c.title0 = r.src
       |)""".stripMargin

  /** L6 wiki-dump distillation CTEs — mirrors graft.wiki.WikiDump: the
    * deterministic synthetic markup dump over customer ⨯ nation, the
    * `#REDIRECT` table, anchor extraction (`[[Target]]` / `[[Target|text]]`)
    * and one-hop-resolved non-category links. Standalone (no ER chain
    * needed); prefix with "WITH " or append to a chain body with ",". */
  val wikiDumpCtes: String =
    """wdump AS (
      |  SELECT 'Customer_' || CAST(c_custkey AS STRING) AS title,
      |    'Customer based in [[Nation_' || CAST(c_nationkey AS STRING)
      |    || '|nation number ' || CAST(c_nationkey AS STRING)
      |    || ']]. See also [[Customer_' || CAST((c_custkey * 7 + 3) % 97 AS STRING)
      |    || ']] and [[' ||
      |    CASE WHEN c_custkey % 7 = 0 THEN 'Cust_' || CAST(c_custkey AS STRING)
      |         ELSE 'Customer_' || CAST(c_custkey AS STRING) END
      |    || '|' || lower(c_name) || ']]. [[Category:Segment_' || c_mktsegment || ']]' AS text
      |  FROM customer
      |  UNION ALL
      |  SELECT DISTINCT 'Nation_' || CAST(c_nationkey AS STRING),
      |         'A nation page. [[Category:Nations]]' FROM customer
      |  UNION ALL
      |  SELECT 'Cust_' || CAST(c_custkey AS STRING),
      |         '#REDIRECT [[Customer_' || CAST(c_custkey AS STRING) || ']]'
      |  FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT DISTINCT c_mktsegment || ' (disambiguation)',
      |         '{{disambiguation}} [[Customer_0]] [[Nation_0]]' FROM customer
      |),
      |wred AS (
      |  SELECT title AS src, regexp_extract(text, '\[\[([^\]|]+)', 1) AS dst
      |  FROM wdump WHERE regexp_matches(text, '(?i)^\s*#redirect')
      |),
      |wanch AS (
      |  SELECT from_title, parts[1] AS target,
      |    CASE WHEN len(parts) >= 2 THEN parts[2] ELSE parts[1] END AS anchor
      |  FROM (
      |    SELECT title AS from_title, string_split(substr(m, 3, len(m) - 4), '|') AS parts
      |    FROM (SELECT title, unnest(regexp_extract_all(text, '\[\[[^\]]+\]\]')) AS m
      |          FROM wdump WHERE NOT regexp_matches(text, '(?i)^\s*#redirect'))
      |  )
      |),
      |wrlinks AS (
      |  SELECT a.from_title, coalesce(r.dst, a.target) AS title, a.anchor
      |  FROM wanch a LEFT JOIN wred r ON a.target = r.src
      |  WHERE a.target NOT LIKE 'Category:%'
      |),
      |wdict AS (
      |  SELECT lower(anchor) AS surface, title, CAST(count(*) AS BIGINT) AS cnt
      |  FROM wrlinks GROUP BY 1, 2
      |)""".stripMargin

  /** Sparse lexicalized feature CTEs (P1/A6/F5/P8/P9 sparse path) — mirrors
    * graft.pipeline.SparseFeatures over the conversation-band pair universe:
    * feature-string explode (bare + `&t=` + `&tt=` conjunction axes, incl.
    * the head prefix/suffix templates),
    * dense dictionary ids by feature sort order, count-based log-odds
    * weights (integer-scaled so per-pair sums are order-independent), sparse
    * dot-product scores. Appended to a chain body. */
  val sparseCtes: String = {
    def shape(x: String): String =
      "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        s"regexp_replace(regexp_replace($x, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g')," +
        " '[0-9]', 'd', 'g'), 'X{3,}', 'XXe', 'g'), 'x{3,}', 'xxe', 'g'), 'd{3,}', 'dde', 'g')"
    val cutoff = graft.pipeline.SparseFeatures.Cutoff
    val scale = graft.pipeline.SparseFeatures.WeightScale
    s""",
       |spn AS (SELECT norm, CAST(count(*) AS BIGINT) AS n_norm FROM mentions GROUP BY norm),
       |semlk AS (
       |  SELECT CAST(c_custkey AS STRING) AS head,
       |    CASE WHEN c_custkey % 2 = 0 THEN 'EVEN' ELSE 'ODD' END AS sem2
       |  FROM customer),
       |hearst0 AS (
       |  SELECT CAST(c_custkey AS STRING) AS head_a,
       |    CAST(c_custkey + k AS STRING) AS head_c,
       |    CAST((c_custkey % 7) * 10 + k AS BIGINT) AS hcnt
       |  FROM customer, (SELECT unnest([1, 2, 3]) AS k)),
       |hearstlk AS (
       |  SELECT * FROM hearst0
       |  UNION ALL SELECT head_c, head_a, hcnt FROM hearst0),
       |spb AS (
       |  SELECT a.mention_id AS ant_id, c.mention_id AS cur_id,
       |    a.mtype AS mtype_a, c.mtype AS mtype_c,
       |    a.head_key AS hk_a, c.head_key AS hk_c,
       |    coalesce(slka.sem2, 'UNK') AS s2_a, coalesce(slkc.sem2, 'UNK') AS s2_c,
       |    CASE WHEN hlk.hcnt IS NULL THEN 'x'
       |         ELSE CAST(CAST(floor(ln(hlk.hcnt + 1)) AS INT) AS STRING) END AS hb,
       |    ${semClassSql("string_split(a.norm, ' ')[len(string_split(a.norm, ' '))]")} AS sc_a,
       |    ${semClassSql("string_split(c.norm, ' ')[len(string_split(c.norm, ' '))]")} AS sc_c,
       |    CASE WHEN na.n_norm >= $cutoff THEN a.norm ELSE ${shape("a.norm")} END AS back_a,
       |    CASE WHEN nc.n_norm >= $cutoff THEN c.norm ELSE ${shape("c.norm")} END AS back_c,
       |    CASE WHEN a.head_key = c.head_key THEN '1' ELSE '0' END AS hm,
       |    CASE WHEN a.norm = c.norm THEN '1' ELSE '0' END AS em,
       |    CAST(least(c.m_seq - a.m_seq, 10) AS STRING) AS db,
       |    CASE WHEN (contains(a.norm, c.norm) OR contains(c.norm, a.norm))
       |          AND a.norm <> c.norm THEN '1' ELSE '0' END AS cn,
       |    CASE WHEN a.norm = array_to_string(list_transform(string_split(c.norm, ' '), t -> substr(t, 1, 1)), '')
       |           OR c.norm = array_to_string(list_transform(string_split(a.norm, ' '), t -> substr(t, 1, 1)), '')
       |         THEN '1' ELSE '0' END AS ab,
       |    CAST(CAST(floor(jaro_winkler_similarity(a.norm, c.norm) * 10) AS INT) AS STRING) AS jwb,
       |    CAST(CAST(floor((1.0 - CAST(levenshtein(a.norm, c.norm) AS DOUBLE)
       |      / CAST(greatest(length(a.norm), length(c.norm)) AS DOUBLE)) * 10) AS INT) AS STRING) AS lvb
       |  FROM mentions a JOIN mentions c ON a.conv_id = c.conv_id
       |    AND c.m_seq > a.m_seq AND c.m_seq - a.m_seq <= $MaxConvDist
       |  JOIN spn na ON a.norm = na.norm JOIN spn nc ON c.norm = nc.norm
       |  LEFT JOIN semlk slka ON a.head_key = slka.head
       |  LEFT JOIN semlk slkc ON c.head_key = slkc.head
       |  LEFT JOIN hearstlk hlk ON a.head_key = hlk.head_a AND c.head_key = hlk.head_c
       |),
       |spf0 AS (
       |  SELECT ant_id, cur_id, mtype_a, mtype_c,
       |    unnest(['bias', 'hm=' || hm, 'em=' || em, 'cur=' || back_c,
       |            'ant=' || back_a, 'cp=' || back_a || '|' || back_c,
       |            'db=' || db, 'sc=1',
       |            'hc=' || hk_c, 'ha=' || hk_a, 'hp=' || hk_a || '|' || hk_c,
       |            'cn=' || cn, 'ab=' || ab,
       |            'jwb=' || jwb, 'lvb=' || lvb,
       |            'scm=' || sc_a || '|' || sc_c,
       |            'scm2=' || s2_a || '|' || s2_c,
       |            'hearst=' || hb,
       |            'pfc=' || substr(hk_c, 1, 3),
       |            'sfc=' || substr(hk_c, greatest(length(hk_c) - 2, 1), 3),
       |            'pfa=' || substr(hk_a, 1, 3),
       |            'sfa=' || substr(hk_a, greatest(length(hk_a) - 2, 1), 3)]) AS f
       |  FROM spb
       |),
       |spf AS MATERIALIZED (
       |  SELECT ant_id, cur_id, f FROM spf0
       |  UNION ALL
       |  SELECT ant_id, cur_id, f || '&t=' || mtype_c FROM spf0
       |  UNION ALL
       |  SELECT ant_id, cur_id, f || '&tt=' || mtype_a || '|' || mtype_c FROM spf0
       |),
       |sdict AS MATERIALIZED (
       |  SELECT f, CAST(ROW_NUMBER() OVER (ORDER BY f) - 1 AS BIGINT) AS feature_id
       |  FROM (SELECT DISTINCT f FROM spf)
       |),
       |slab AS (
       |  SELECT b.ant_id, b.cur_id,
       |    CASE WHEN ga.entity_id = gc.entity_id THEN 1.0 ELSE 0.0 END AS label
       |  FROM spb b JOIN gold ga ON b.ant_id = ga.mention_id
       |  JOIN gold gc ON b.cur_id = gc.mention_id
       |),
       |sw AS (
       |  SELECT f.f,
       |    CAST(round(ln((SUM(l.label) + 1.0) / (SUM(1.0 - l.label) + 1.0)) * $scale, 0) AS BIGINT) AS w_i
       |  FROM spf f JOIN slab l ON f.ant_id = l.ant_id AND f.cur_id = l.cur_id
       |  GROUP BY f.f
       |),
       |sscores AS (
       |  SELECT f.ant_id, f.cur_id, CAST(count(*) AS BIGINT) AS n_feats,
       |    round(CAST(SUM(w.w_i) AS DOUBLE) / $scale.0, 6) AS score_r
       |  FROM spf f JOIN sdict d ON f.f = d.f JOIN sw w ON f.f = w.f
       |  GROUP BY f.ant_id, f.cur_id
       |)""".stripMargin
  }

  /** Surface-pure sparse feature CTEs (the sparse pipeline's bridge/chain
    * leg — mirrors graft.pipeline.SparseFeatures.surfaceFeatureStrings over
    * the blocked surface pairs: BARE templates only, conversational columns
    * at their neutral constants, scored with the band-trained `sw` weights
    * via LEFT join so unweighted features contribute 0). Append AFTER
    * [[sparseCtes]] (reuses `spn`/`sw`) in a chain containing `spairs` and
    * `surfaces`. */
  val surfSparseCtes: String = {
    def shape(x: String): String =
      "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        s"regexp_replace(regexp_replace($x, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g')," +
        " '[0-9]', 'd', 'g'), 'X{3,}', 'XXe', 'g'), 'x{3,}', 'xxe', 'g'), 'd{3,}', 'dde', 'g')"
    val cutoff = graft.pipeline.SparseFeatures.Cutoff
    val scale = graft.pipeline.SparseFeatures.WeightScale
    s""",
       |ssb AS (
       |  SELECT p.norm_a, p.norm_b, p.block_key,
       |    a.head_key AS hk_a, c.head_key AS hk_c,
       |    ${semClassSql("a.toks[len(a.toks)]")} AS sc_a,
       |    ${semClassSql("c.toks[len(c.toks)]")} AS sc_c,
       |    CASE WHEN na.n_norm >= $cutoff THEN p.norm_a ELSE ${shape("p.norm_a")} END AS back_a,
       |    CASE WHEN nc.n_norm >= $cutoff THEN p.norm_b ELSE ${shape("p.norm_b")} END AS back_c,
       |    CASE WHEN a.head_key = c.head_key THEN '1' ELSE '0' END AS hm,
       |    CASE WHEN p.norm_a = p.norm_b THEN '1' ELSE '0' END AS em,
       |    CASE WHEN (contains(p.norm_a, p.norm_b) OR contains(p.norm_b, p.norm_a))
       |          AND p.norm_a <> p.norm_b THEN '1' ELSE '0' END AS cn,
       |    CASE WHEN p.norm_a = array_to_string(list_transform(c.toks, t -> substr(t, 1, 1)), '')
       |           OR p.norm_b = array_to_string(list_transform(a.toks, t -> substr(t, 1, 1)), '')
       |         THEN '1' ELSE '0' END AS ab,
       |    CAST(CAST(floor(jaro_winkler_similarity(p.norm_a, p.norm_b) * 10) AS INT) AS STRING) AS jwb,
       |    CAST(CAST(floor((1.0 - CAST(levenshtein(p.norm_a, p.norm_b) AS DOUBLE)
       |      / CAST(greatest(length(p.norm_a), length(p.norm_b)) AS DOUBLE)) * 10) AS INT) AS STRING) AS lvb
       |  FROM spairs p
       |  JOIN surfaces a ON p.norm_a = a.norm
       |  JOIN surfaces c ON p.norm_b = c.norm
       |  JOIN spn na ON p.norm_a = na.norm
       |  JOIN spn nc ON p.norm_b = nc.norm
       |),
       |ssf AS (
       |  SELECT norm_a, norm_b, block_key,
       |    unnest(['bias', 'hm=' || hm, 'em=' || em, 'cur=' || back_c,
       |            'ant=' || back_a, 'cp=' || back_a || '|' || back_c,
       |            'db=x', 'sc=0',
       |            'hc=' || hk_c, 'ha=' || hk_a, 'hp=' || hk_a || '|' || hk_c,
       |            'cn=' || cn, 'ab=' || ab,
       |            'jwb=' || jwb, 'lvb=' || lvb,
       |            'scm=' || sc_a || '|' || sc_c,
       |            'pfc=' || substr(hk_c, 1, 3),
       |            'sfc=' || substr(hk_c, greatest(length(hk_c) - 2, 1), 3),
       |            'pfa=' || substr(hk_a, 1, 3),
       |            'sfa=' || substr(hk_a, greatest(length(hk_a) - 2, 1), 3)]) AS f
       |  FROM ssb
       |),
       |sp11 AS (
       |  SELECT f.norm_a, f.norm_b, f.block_key,
       |    round(CAST(SUM(coalesce(w.w_i, 0)) AS DOUBLE) / $scale.0, 6) AS score_r
       |  FROM ssf f LEFT JOIN sw w ON f.f = w.f
       |  GROUP BY 1, 2, 3
       |)""".stripMargin
  }

  /** NER CTEs (G1/G2 emissions + Viterbi + chunks) — generated from the SAME
    * graft.ner.Ner transition/init constants so the two engines cannot
    * drift. The recursive CTE carries, per (conv, turn, pos), the best score
    * and path string per label; tie-breaks prefer O, then B, then I, exactly
    * like the Scala argmax loop; all score arithmetic is associated
    * `(prev + trans) + emit` in both engines. */
  val nerCtes: String = {
    import graft.ner.Ner
    val name = Vector("o", "b", "i")
    def cand(l: Int): Seq[String] =
      (0 until 3).map(p => s"(v.s_${name(p)} + ${Ner.Trans(p)(l)})")
    def pick(l: Int, proj: Int => String): String = {
      val Seq(co, cb, ci) = cand(l)
      s"CASE WHEN $co >= $cb AND $co >= $ci THEN ${proj(0)} WHEN $cb >= $ci THEN ${proj(1)} ELSE ${proj(2)} END"
    }
    val sNew = (0 until 3).map { l =>
      s"(${pick(l, i => cand(l)(i))}) + e.e_${name(l)} AS s_${name(l)}"
    }.mkString(",\n       |    ")
    val pNew = (0 until 3).map { l =>
      s"(${pick(l, i => s"v.p_${name(i)}")}) || '${Ner.Labels(l)}' AS p_${name(l)}"
    }.mkString(",\n       |    ")
    s""",
       |nemis AS (
       |  SELECT conv_id, turn_idx, pos, tok,
       |    0.5 AS e_o,
       |    -2.0 + 4.0 * (CASE WHEN regexp_matches(tok, '^(?:[A-Za-z]+[#-])?[0-9]+$$') THEN 1.0 ELSE 0.0 END)
       |        + 3.0 * (CASE WHEN pos > 0 AND regexp_matches(tok, '^[A-Z][A-Za-z0-9#-]*$$') THEN 1.0 ELSE 0.0 END) AS e_b,
       |    -3.0 + 2.0 * (CASE WHEN regexp_matches(tok, '^[0-9]+$$') THEN 1.0 ELSE 0.0 END)
       |        + 3.5 * (CASE WHEN prev IS NOT NULL AND regexp_matches(prev, '^[A-Z][A-Za-z0-9#-]*$$')
       |                       AND regexp_matches(tok, '^[A-Z0-9][A-Za-z0-9#-]*$$') THEN 1.0 ELSE 0.0 END) AS e_i
       |  FROM (SELECT conv_id, turn_idx, pos, tok,
       |          lag(tok) OVER (PARTITION BY conv_id, turn_idx ORDER BY pos) AS prev
       |        FROM toks)
       |),
       |vit AS (
       |  SELECT conv_id, turn_idx, pos,
       |    ${Ner.Init(0)} + e_o AS s_o, ${Ner.Init(1)} + e_b AS s_b, ${Ner.Init(2)} + e_i AS s_i,
       |    'O' AS p_o, 'B' AS p_b, 'I' AS p_i
       |  FROM nemis WHERE pos = 0
       |  UNION ALL
       |  SELECT e.conv_id, e.turn_idx, e.pos,
       |    $sNew,
       |    $pNew
       |  FROM vit v JOIN nemis e
       |    ON e.conv_id = v.conv_id AND e.turn_idx = v.turn_idx AND e.pos = v.pos + 1
       |),
       |nlast AS (SELECT conv_id, turn_idx, max(pos) AS last FROM nemis GROUP BY conv_id, turn_idx),
       |nbest AS (
       |  SELECT v.conv_id, v.turn_idx,
       |    CASE WHEN s_o >= s_b AND s_o >= s_i THEN p_o
       |         WHEN s_b >= s_i THEN p_b ELSE p_i END AS path
       |  FROM vit v JOIN nlast l
       |    ON v.conv_id = l.conv_id AND v.turn_idx = l.turn_idx AND v.pos = l.last
       |),
       |nlabels AS (
       |  SELECT e.conv_id, e.turn_idx, e.pos, e.tok, substr(b.path, e.pos + 1, 1) AS label
       |  FROM nemis e JOIN nbest b ON e.conv_id = b.conv_id AND e.turn_idx = b.turn_idx
       |),
       |nchunks AS (
       |  SELECT conv_id, turn_idx, CAST(min(pos) AS INT) AS start, CAST(max(pos) AS INT) AS "end"
       |  FROM (SELECT *, SUM(CASE WHEN label <> 'I' THEN 1 ELSE 0 END)
       |          OVER (PARTITION BY conv_id, turn_idx ORDER BY pos) AS grp
       |        FROM nlabels)
       |  WHERE label <> 'O'
       |  GROUP BY conv_id, turn_idx, grp
       |)""".stripMargin
  }

  /** G2 forward-backward CTEs (appended after [[nerCtes]]): log-space
    * sum-product over the same `nemis` emissions, recurrences and the
    * three-way log-sum-exp associated EXACTLY like graft.ner.Ner's kernel
    * (`(LSE…) + emit`, `ln(exp(x0-m)+exp(x1-m)+exp(x2-m)) + m`). */
  val nerFbCtes: String = {
    import graft.ner.Ner
    val name = Vector("o", "b", "i")
    def lse(x0: String, x1: String, x2: String): String = {
      val m = s"greatest($x0, $x1, $x2)"
      s"(ln(exp(($x0) - $m) + exp(($x1) - $m) + exp(($x2) - $m)) + $m)"
    }
    def fwdStep(l: Int): String = {
      val xs = (0 until 3).map(p => s"v.a_${name(p)} + ${Ner.Trans(p)(l)}")
      s"${lse(xs(0), xs(1), xs(2))} + e.e_${name(l)} AS a_${name(l)}"
    }
    def bwdStep(l: Int): String = {
      val xs = (0 until 3).map(nx => s"${Ner.Trans(l)(nx)} + e.e_${name(nx)} + v.b_${name(nx)}")
      s"${lse(xs(0), xs(1), xs(2))} AS b_${name(l)}"
    }
    s""",
       |fwd AS (
       |  -- CAST: nemis emissions are DECIMAL in DuckDB (exact for Viterbi's
       |  -- add/compare); a DECIMAL anchor would coerce the recursive LSE
       |  -- results back to fixed scale and round them
       |  SELECT conv_id, turn_idx, pos,
       |    CAST(${Ner.Init(0)} + e_o AS DOUBLE) AS a_o,
       |    CAST(${Ner.Init(1)} + e_b AS DOUBLE) AS a_b,
       |    CAST(${Ner.Init(2)} + e_i AS DOUBLE) AS a_i
       |  FROM nemis WHERE pos = 0
       |  UNION ALL
       |  SELECT e.conv_id, e.turn_idx, e.pos,
       |    ${fwdStep(0)},
       |    ${fwdStep(1)},
       |    ${fwdStep(2)}
       |  FROM fwd v JOIN nemis e
       |    ON e.conv_id = v.conv_id AND e.turn_idx = v.turn_idx AND e.pos = v.pos + 1
       |),
       |bwd AS (
       |  -- CAST: a bare 0.0 anchor literal is DECIMAL(2,1) in DuckDB and the
       |  -- recursive union would coerce every beta to one decimal place
       |  SELECT conv_id, turn_idx, last AS pos, CAST(0.0 AS DOUBLE) AS b_o,
       |    CAST(0.0 AS DOUBLE) AS b_b, CAST(0.0 AS DOUBLE) AS b_i FROM nlast
       |  UNION ALL
       |  SELECT v.conv_id, v.turn_idx, v.pos - 1,
       |    ${bwdStep(0)},
       |    ${bwdStep(1)},
       |    ${bwdStep(2)}
       |  FROM bwd v JOIN nemis e
       |    ON e.conv_id = v.conv_id AND e.turn_idx = v.turn_idx AND e.pos = v.pos
       |  WHERE v.pos > 0
       |),
       |nz AS (
       |  SELECT f.conv_id, f.turn_idx, ${lse("f.a_o", "f.a_b", "f.a_i")} AS z
       |  FROM fwd f JOIN nlast l
       |    ON f.conv_id = l.conv_id AND f.turn_idx = l.turn_idx AND f.pos = l.last
       |),
       |nmarg AS (
       |  SELECT f.conv_id, f.turn_idx, f.pos, e.tok,
       |    round(exp((f.a_o + b.b_o) - z.z), 6) AS m_o_r,
       |    round(exp((f.a_b + b.b_b) - z.z), 6) AS m_b_r,
       |    round(exp((f.a_i + b.b_i) - z.z), 6) AS m_i_r
       |  FROM fwd f
       |  JOIN bwd b ON f.conv_id = b.conv_id AND f.turn_idx = b.turn_idx AND f.pos = b.pos
       |  JOIN nz z ON f.conv_id = z.conv_id AND f.turn_idx = z.turn_idx
       |  JOIN nemis e ON f.conv_id = e.conv_id AND f.turn_idx = e.turn_idx AND f.pos = e.pos
       |)""".stripMargin
  }

  /** Full oracle query: recursive-CTE prefix + body. */
  def q(body: String): String = s"WITH RECURSIVE $chain\n$body"

  /** All-generators oracle query (through surface scoring). */
  def qAll(body: String): String = s"WITH RECURSIVE $allChain\n$body"
}
