package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.harness.{ErOracle, OpsOracle, Queries}
import graft.sources.Transcripts

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Operator ids (q names) reference the SURVEY.md §2 inventory. */
object SparkEntry {

  /** Flagship: full ER pipeline on sf0.001 — clustered mention records. */
  def entry(spark: SparkSession): DataFrame =
    Queries.clustersQ(spark, "/root/testdata/sf0.001")

  // -- shared A10 oracle bodies (muc/bcub/ceafe verbatim; conll composes) --

  private val mucBody: String =
    """SELECT
      | round(CAST(num_p AS DOUBLE) / CAST(den_p AS DOUBLE), 6) AS muc_precision_r,
      | round(CAST(num_r AS DOUBLE) / CAST(den_r AS DOUBLE), 6) AS muc_recall_r,
      | round(2.0 * (CAST(num_p AS DOUBLE) / CAST(den_p AS DOUBLE))
      |     * (CAST(num_r AS DOUBLE) / CAST(den_r AS DOUBLE))
      |   / ((CAST(num_p AS DOUBLE) / CAST(den_p AS DOUBLE))
      |     + (CAST(num_r AS DOUBLE) / CAST(den_r AS DOUBLE))), 6) AS muc_f1_r
      |FROM
      | (SELECT CAST(SUM(sz - parts) AS BIGINT) AS num_r, CAST(SUM(sz - 1) AS BIGINT) AS den_r
      |  FROM (SELECT g.entity_id, count(*) AS sz, count(DISTINCT c.cluster_id) AS parts
      |        FROM clusters c JOIN gold g ON c.mention_id = g.mention_id
      |        GROUP BY g.entity_id)),
      | (SELECT CAST(SUM(sz - parts) AS BIGINT) AS num_p, CAST(SUM(sz - 1) AS BIGINT) AS den_p
      |  FROM (SELECT c.cluster_id, count(*) AS sz, count(DISTINCT g.entity_id) AS parts
      |        FROM clusters c JOIN gold g ON c.mention_id = g.mention_id
      |        GROUP BY c.cluster_id))""".stripMargin

  private val bcubBody: String =
    """SELECT
      | round(sum_p / n, 6) AS bcub_precision_r,
      | round(sum_r / n, 6) AS bcub_recall_r,
      | round(2.0 * (sum_p / n) * (sum_r / n) / ((sum_p / n) + (sum_r / n)), 6) AS bcub_f1_r
      |FROM
      | (SELECT SUM(ovl * ovl / CAST(csz AS DOUBLE)) AS sum_p,
      |         SUM(ovl * ovl / CAST(gsz AS DOUBLE)) AS sum_r
      |  FROM (SELECT cell.cluster_id, cell.entity_id, cell.ovl, cs.csz, gs.gsz
      |        FROM (SELECT c.cluster_id, g.entity_id, CAST(count(*) AS BIGINT) AS ovl
      |              FROM clusters c JOIN gold g ON c.mention_id = g.mention_id
      |              GROUP BY c.cluster_id, g.entity_id) cell
      |        JOIN (SELECT c.cluster_id, CAST(count(*) AS BIGINT) AS csz
      |              FROM clusters c JOIN gold g ON c.mention_id = g.mention_id
      |              GROUP BY c.cluster_id) cs ON cell.cluster_id = cs.cluster_id
      |        JOIN (SELECT g.entity_id, CAST(count(*) AS BIGINT) AS gsz
      |              FROM clusters c JOIN gold g ON c.mention_id = g.mention_id
      |              GROUP BY g.entity_id) gs ON cell.entity_id = gs.entity_id)),
      | (SELECT CAST(count(*) AS DOUBLE) AS n
      |  FROM clusters c JOIN gold g ON c.mention_id = g.mention_id)""".stripMargin

  // CEAFe closed form: on this corpus every conversation carries exactly
  // one gold entity (entity_id = the conv prefix), so the optimal
  // cluster↔entity matching degenerates to "best φ4 cluster per
  // conversation" — SQL-expressible, and value-identical to the engine's
  // general Hungarian matching on this input (the general path is gated by
  // CeafSpec on a multi-entity fixture).
  private val ceafeCtes: String =
    """ceaf0 AS (
      |  SELECT substr(mention_id, 1, length(mention_id) - 13) AS conv, cluster_id
      |  FROM clusters
      |),
      |ceafc AS (
      |  SELECT conv, cluster_id, CAST(count(*) AS BIGINT) AS csz
      |  FROM ceaf0 GROUP BY conv, cluster_id
      |),
      |ceafg AS (
      |  SELECT conv, CAST(count(*) AS BIGINT) AS gsz FROM ceaf0 GROUP BY conv
      |),
      |ceafp AS (
      |  SELECT c.conv, max(2.0 * c.csz / (c.csz + g.gsz)) AS phi,
      |         CAST(count(*) AS BIGINT) AS np
      |  FROM ceafc c JOIN ceafg g ON c.conv = g.conv
      |  GROUP BY c.conv
      |)""".stripMargin

  private val ceafeBody: String =
    """SELECT
      |  CAST(SUM(np) AS BIGINT) AS n_pred_clusters,
      |  CAST(count(*) AS BIGINT) AS n_gold_entities,
      |  round(SUM(phi) / SUM(np), 6) AS ceafe_precision_r,
      |  round(SUM(phi) / count(*), 6) AS ceafe_recall_r,
      |  round(2.0 * (SUM(phi) / SUM(np)) * (SUM(phi) / count(*))
      |    / ((SUM(phi) / SUM(np)) + (SUM(phi) / count(*))), 6) AS ceafe_f1_r
      |FROM ceafp""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Queries.q1Agg _),
    "w7_turn_assembly" -> (Queries.w7TurnAssembly _),
    "m1_mentions" -> (Queries.m1Mentions _),
    "m1b_mentions_all" -> (Queries.m1bMentionsAll _),
    "p2_surface_scores_all" -> (Queries.p2SurfaceScoresAll _),
    "b4_b5_block_stats" -> (Queries.blockStats _),
    "b1_candidate_pairs" -> (Queries.pairsQ _),
    "p_surface_pairs" -> (Queries.surfacePairsQ _),
    "p9_scored_pairs" -> (Queries.scoredQ _),
    "p5_band_features" -> (Queries.p5BandFeatures _),
    "a6_feature_dict" -> (Queries.a6FeatureDict _),
    "p10_sparse_scores" -> (Queries.p10SparseScores _),
    "p11_sparse_surface" -> (Queries.p11SparseSurface _),
    "p11b_sparse_fast" -> (Queries.p11bSparseSurfaceFast _),
    "a2_backptrs" -> (Queries.backptrsQ _),
    "g3_joint_decode" -> (Queries.g3JointDecode _),
    "a1_marginals" -> (Queries.a1Marginals _),
    "b2_pruned_pairs" -> (Queries.b2Pruned _),
    "a9_slices" -> (Queries.a9Slices _),
    "s5_model" -> (Queries.s5Model _),
    "s5b_sparse_model" -> (Queries.s5bSparseModel _),
    "l2_link_titles" -> (Queries.l2LinkTitles _),
    "l6_title_given_surface" -> (Queries.l6TitleGivenSurfaceQ _),
    "l6_dump_stats" -> (Queries.l6DumpStatsQ _),
    "l6_link_titles" -> (Queries.l6LinkTitlesQ _),
    "a12_wiki_eval" -> (Queries.a12WikiEval _),
    "l5_query_denotation" -> (Queries.l5QueryDenotation _),
    "a12b_wiki_eval_l5" -> (Queries.a12bWikiEvalL5 _),
    "a13_bootstrap" -> ((s: SparkSession, d: String) => Queries.a13Bootstrap(s, d)),
    "g2_ner_viterbi" -> (Queries.g2NerViterbi _),
    "g3_ner_marginals" -> (Queries.g3NerMarginals _),
    "a11_ner_f1" -> (Queries.a11NerF1 _),
    "c1_clusters" -> (Queries.clustersQ _),
    "c2_incremental_edit" -> (Queries.c2IncrementalEditQ _),
    "c2b_stream_fold" -> (Queries.c2bStreamFoldQ _),
    "a8_pairwise_f1" -> (Queries.pairwiseF1Q _),
    "b7_blocking_recall" -> (Queries.blockingRecallQ _),
    "a10_muc" -> (Queries.mucQ _),
    "a10_bcub" -> (Queries.bcubQ _),
    "a10_ceafe" -> (Queries.a10CeafeQ _),
    "a10_conll" -> (Queries.a10ConllQ _),
    "a14_top_weights" -> (Queries.a14TopWeights _),
    "c3_nonsingletons" -> (Queries.c3NonSingletons _),
    "c4_dense_relabel" -> (Queries.c4DenseRelabel _),
    "c5_oracle_clusters" -> (Queries.c5OracleClusters _),
    "w2_det_order" -> (Queries.w2DetOrder _),
    "f6_pronouns" -> (Queries.f6Pronouns _),
    "f8_f10_containment" -> (Queries.f8f10Containment _),
    "u2_folds" -> (Queries.u2Folds _),
    "b6_ner_domains" -> (Queries.b6NerDomains _),
    "a3_likelihood" -> (Queries.a3Likelihood _),
    "a7_mention_prf" -> (Queries.a7MentionPrf _),
    "f7_f11_properties" -> (Queries.f7f11Properties _),
    "a5_lexcounts" -> (Queries.lexCountsQ _),
    "a5b_lex_bundle" -> (Queries.a5bLexBundle _),
    "w3_top_heads" -> (Queries.topHeadsQ _),
    "a16_rollup" -> (Queries.rollupQ _),
    // training-data pipeline ops
    "dd_exact" -> (Queries.ddExactQ _),
    "dd_minhash_lsh" -> (Queries.ddMinhashLshQ _),
    "dd_canonical" -> (Queries.ddCanonicalQ _),
    "dd_ngram_jaccard" -> (Queries.ddNgramJaccardQ _),
    "dd_simhash" -> (Queries.ddSimhashQ _),
    "dd_embedding" -> (Queries.ddEmbeddingQ _),
    "sim_topk_brute" -> (Queries.simTopKQ _),
    "sim_ann_lsh" -> (Queries.simAnnLshQ _),
    "sim_ann_ivf" -> (Queries.simAnnIvfQ _),
    "ta_langid" -> (Queries.taLangIdQ _),
    "ta_quality" -> (Queries.taQualityQ _),
    "ta_token_counts" -> (Queries.taTokenCountsQ _),
    "ta_fingerprint" -> (Queries.taFingerprintQ _),
    "mm_meta" -> (Queries.mmMetaQ _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "w7_turn_assembly" -> Transcripts.withCte(
      """SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
        | md5(string_agg(text, '|' ORDER BY turn_idx)) AS turns_md5
        |FROM transcripts GROUP BY conv_id""".stripMargin),

    "m1_mentions" -> ErOracle.q(
      "SELECT mention_id, conv_id, turn_idx, start, surface, mtype, m_seq, head_key FROM mentions"),

    "m1b_mentions_all" -> ErOracle.qAll(
      """SELECT mention_id, conv_id, turn_idx, start, "end", surface, mtype, m_seq, head_key
        |FROM mentions""".stripMargin),

    "p2_surface_scores_all" -> ErOracle.qAll(
      """SELECT norm_a, norm_b, block_key,
        | round(f_token_jaccard, 6) AS f_token_jaccard_r,
        | round(f_jaro_winkler, 6) AS f_jaro_winkler_r,
        | round(f_lev_sim, 6) AS f_lev_sim_r,
        | f_abbrev, round(score, 6) AS score_r
        |FROM sscored""".stripMargin),

    "b4_b5_block_stats" -> ErOracle.q(
      s"""SELECT block_key, CAST(n_surfaces AS BIGINT) AS n_surfaces,
         | CAST(mention_mass AS BIGINT) AS mention_mass,
         | n_surfaces > ${ErOracle.MaxBlockSize} OR mention_mass > ${ErOracle.MaxBlockMass} AS oversize
         |FROM bstats""".stripMargin),

    "b1_candidate_pairs" -> ErOracle.q(
      "SELECT ant_id, cur_id, block_key FROM cpairs"),

    "p_surface_pairs" -> ErOracle.q(
      "SELECT norm_a, norm_b, block_key, round(score, 6) AS score_r FROM sscored"),

    "p9_scored_pairs" -> ErOracle.q(
      "SELECT ant_id, cur_id, round(score, 6) AS score_r FROM scoredall"),

    "p5_band_features" -> ErOracle.q(
      """SELECT ant_id, cur_id, f_same_role, f_number_match, f_number_clash,
        | f_gender_match, f_gender_clash,
        | round(f_dist_decay, 6) AS f_dist_decay_r, round(score, 6) AS score_r
        |FROM bscored""".stripMargin),

    "a2_backptrs" -> ErOracle.q(
      "SELECT cur_id, ant_id FROM backptrs"),

    "a6_feature_dict" -> ErOracle.q(ErOracle.sparseCtes +
      "\nSELECT f, feature_id FROM sdict"),

    "p10_sparse_scores" -> ErOracle.q(ErOracle.sparseCtes +
      "\nSELECT ant_id, cur_id, n_feats, score_r FROM sscores"),

    "p11_sparse_surface" -> ErOracle.q(ErOracle.sparseCtes + ErOracle.surfSparseCtes +
      "\nSELECT norm_a, norm_b, block_key, score_r FROM sp11"),

    // identical SQL to p11 by design: the Spark side computes these scores
    // via the broadcast SparseWeightSum expression instead of the weight
    // join, so the MATCH is the oracle proof of the fast path's exactness
    "p11b_sparse_fast" -> ErOracle.q(ErOracle.sparseCtes + ErOracle.surfSparseCtes +
      "\nSELECT norm_a, norm_b, block_key, score_r FROM sp11"),

    "a1_marginals" -> ErOracle.q(
      """SELECT cur_id, ant_id, round(e / sum(e) OVER (PARTITION BY cur_id), 6) AS marginal_r
        |FROM (SELECT cur_id, ant_id,
        |        exp(score - max(score) OVER (PARTITION BY cur_id)) AS e
        |      FROM scoredall)""".stripMargin),

    "b2_pruned_pairs" -> ErOracle.q(
      """SELECT ant_id, cur_id, round(score, 6) AS score_r
        |FROM (SELECT ant_id, cur_id, score,
        |        max(score) OVER (PARTITION BY cur_id) AS mx
        |      FROM scoredall)
        |WHERE score >= mx - 5.0""".stripMargin),

    "l2_link_titles" -> ErOracle.q(ErOracle.linkingCtes +
      "\nSELECT mention_id, title, prio, CAST(cnt AS INT) AS cnt FROM llinks"),

    // L6: dump distillation — the full title-given-surface DB.
    "l6_title_given_surface" ->
      s"WITH ${ErOracle.wikiDumpCtes}\nSELECT surface, title, cnt FROM wdict",

    // L6: per-page wide stats pinning redirects/aux/links/categories at once.
    // (concatenated, NOT interpolated into a stripMargin template — the CTE
    // text contains line-leading `||` that stripMargin would mangle)
    "l6_dump_stats" -> (s"WITH ${ErOracle.wikiDumpCtes}\n" + """SELECT d.title,
      |  coalesce(r.dst, '') AS redirect_to,
      |  CAST(CASE WHEN x.title IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_disambig,
      |  CAST(coalesce(l.n_links, 0) AS BIGINT) AS n_links,
      |  CAST(coalesce(c.n_categories, 0) AS BIGINT) AS n_categories
      |FROM wdump d
      |LEFT JOIN wred r ON d.title = r.src
      |LEFT JOIN (SELECT from_title, count(*) AS n_links
      |           FROM (SELECT DISTINCT from_title, title FROM wrlinks)
      |           GROUP BY 1) l ON d.title = l.from_title
      |LEFT JOIN (SELECT from_title AS title, count(*) AS n_categories
      |           FROM wanch WHERE target LIKE 'Category:%'
      |           GROUP BY 1) c ON d.title = c.title
      |LEFT JOIN (SELECT title FROM wdump
      |           WHERE title LIKE '% (disambiguation)'
      |              OR text LIKE '{{disambiguation}}%') x ON d.title = x.title"""
      .stripMargin),

    // L6→L2: link through the DISTILLED dictionary (same expansion/argmax
    // SQL as l2, dict + redirects swapped for the dump-derived ones).
    "l6_link_titles" -> ErOracle.q(ErOracle.linkingCtes + ",\n" +
      ErOracle.wikiDumpCtes + "," +
      """
        |whits AS (
        |  SELECT q.mention_id, q.prio, d.title, d.cnt
        |  FROM lqueries q JOIN wdict d ON q.query = d.surface
        |),
        |wbest AS (
        |  SELECT mention_id, title AS title0, prio, cnt FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY mention_id
        |      ORDER BY prio ASC, cnt DESC, title ASC) AS rk FROM whits
        |  ) WHERE rk = 1
        |)
        |SELECT b.mention_id, coalesce(r.dst, b.title0) AS title, b.prio, b.cnt
        |FROM wbest b LEFT JOIN wred r ON b.title0 = r.src""".stripMargin),

    "a12_wiki_eval" -> ErOracle.q(ErOracle.linkingCtes +
      """,
        |lg AS (SELECT g.mention_id, 'Customer_' || g.entity_id AS gold_title FROM gold g)
        |SELECT
        |  CAST(count(*) AS BIGINT) AS n_gold,
        |  CAST(SUM(CASE WHEN l.title IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_linked,
        |  CAST(SUM(CASE WHEN l.title = lg.gold_title THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |  CASE WHEN SUM(CASE WHEN l.title IS NOT NULL THEN 1 ELSE 0 END) > 0
        |    THEN round(CAST(SUM(CASE WHEN l.title = lg.gold_title THEN 1 ELSE 0 END) AS DOUBLE)
        |      / SUM(CASE WHEN l.title IS NOT NULL THEN 1 ELSE 0 END), 6)
        |    ELSE 0.0 END AS acc_linked_r,
        |  CASE WHEN count(*) > 0
        |    THEN round(CAST(SUM(CASE WHEN l.title = lg.gold_title THEN 1 ELSE 0 END) AS DOUBLE)
        |      / count(*), 6)
        |    ELSE 0.0 END AS acc_all_r
        |FROM lg LEFT JOIN llinks l ON lg.mention_id = l.mention_id""".stripMargin),

    "l5_query_denotation" -> ErOracle.q(ErOracle.linkingCtes + ErOracle.linkingL5Ctes +
      "\nSELECT mention_id, title, round(dscore, 6) AS score_r FROM l5links"),

    "a12b_wiki_eval_l5" -> ErOracle.q(ErOracle.linkingCtes + ErOracle.linkingL5Ctes +
      """,
        |lg5 AS (SELECT g.mention_id, 'Customer_' || g.entity_id AS gold_title FROM gold g)
        |SELECT
        |  CAST(count(*) AS BIGINT) AS n_gold,
        |  CAST(SUM(CASE WHEN l.title IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_linked,
        |  CAST(SUM(CASE WHEN l.title = lg5.gold_title THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |  CASE WHEN SUM(CASE WHEN l.title IS NOT NULL THEN 1 ELSE 0 END) > 0
        |    THEN round(CAST(SUM(CASE WHEN l.title = lg5.gold_title THEN 1 ELSE 0 END) AS DOUBLE)
        |      / SUM(CASE WHEN l.title IS NOT NULL THEN 1 ELSE 0 END), 6)
        |    ELSE 0.0 END AS acc_linked_r,
        |  CASE WHEN count(*) > 0
        |    THEN round(CAST(SUM(CASE WHEN l.title = lg5.gold_title THEN 1 ELSE 0 END) AS DOUBLE)
        |      / count(*), 6)
        |    ELSE 0.0 END AS acc_all_r
        |FROM lg5 LEFT JOIN l5links l ON lg5.mention_id = l.mention_id""".stripMargin),

    "g2_ner_viterbi" -> ErOracle.qAll(ErOracle.nerCtes +
      "\nSELECT conv_id, turn_idx, pos, tok, label FROM nlabels"),

    "g3_ner_marginals" -> ErOracle.qAll(ErOracle.nerCtes + ErOracle.nerFbCtes +
      "\nSELECT conv_id, turn_idx, pos, tok, m_o_r, m_b_r, m_i_r FROM nmarg"),

    "a11_ner_f1" -> ErOracle.qAll(ErOracle.nerCtes +
      """,
        |nagg AS (
        |  SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM nchunks c
        |     JOIN mentions m ON m.mtype = 'PROPER' AND c.conv_id = m.conv_id
        |       AND c.turn_idx = m.turn_idx AND c.start = m.start AND c."end" = m."end") AS tp,
        |    (SELECT CAST(count(*) AS BIGINT) FROM nchunks) AS n_pred,
        |    (SELECT CAST(count(*) AS BIGINT) FROM mentions WHERE mtype = 'PROPER') AS n_gold
        |)
        |SELECT tp, n_pred, n_gold,
        |  round(CAST(tp AS DOUBLE) / n_pred, 6) AS precision_r,
        |  round(CAST(tp AS DOUBLE) / n_gold, 6) AS recall_r,
        |  round(2.0 * (CAST(tp AS DOUBLE) / n_pred) * (CAST(tp AS DOUBLE) / n_gold)
        |    / ((CAST(tp AS DOUBLE) / n_pred) + (CAST(tp AS DOUBLE) / n_gold)), 6) AS f1_r
        |FROM nagg""".stripMargin),

    "a13_bootstrap" -> ErOracle.q(
      """,
        |cstats AS (
        |  SELECT m.conv_id,
        |    CAST(SUM(CASE WHEN ca.cluster_id = cc.cluster_id AND ga.entity_id = gc.entity_id THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN ca.cluster_id = cc.cluster_id THEN 1 ELSE 0 END) AS BIGINT) AS pred,
        |    CAST(SUM(CASE WHEN ga.entity_id = gc.entity_id THEN 1 ELSE 0 END) AS BIGINT) AS gold
        |  FROM mentions m JOIN mentions m2
        |    ON m.conv_id = m2.conv_id AND m.m_seq < m2.m_seq
        |  JOIN clusters ca ON m.mention_id = ca.mention_id
        |  JOIN clusters cc ON m2.mention_id = cc.mention_id
        |  JOIN gold ga ON m.mention_id = ga.mention_id
        |  JOIN gold gc ON m2.mention_id = gc.mention_id
        |  GROUP BY m.conv_id
        |),
        |draws AS (
        |  SELECT b.b, s.tp, s.pred, s.gold,
        |    md5(CAST(b.b AS VARCHAR) || ':' || s.conv_id) AS h
        |  FROM (SELECT CAST(unnest(range(200)) AS INT) AS b) b CROSS JOIN cstats s
        |),
        |counted AS (
        |  SELECT b, tp, pred, gold,
        |    CASE WHEN u < 0.367879441 THEN 0 WHEN u < 0.735758882 THEN 1
        |         WHEN u < 0.919698603 THEN 2 WHEN u < 0.981011843 THEN 3
        |         WHEN u < 0.996340153 THEN 4 WHEN u < 0.999405815 THEN 5
        |         WHEN u < 0.999916758 THEN 6 ELSE 7 END AS cnt
        |  FROM (
        |    SELECT b, tp, pred, gold,
        |      CAST((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456
        |         + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216
        |         + (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576
        |         + (instr('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536
        |         + (instr('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096
        |         + (instr('0123456789abcdef', substr(h, 6, 1)) - 1) * 256
        |         + (instr('0123456789abcdef', substr(h, 7, 1)) - 1) * 16
        |         + (instr('0123456789abcdef', substr(h, 8, 1)) - 1)
        |        AS DOUBLE) / 4294967296.0 AS u
        |    FROM draws)
        |)
        |SELECT b, round(2.0 * tp / (pred + gold), 6) AS f1_r FROM (
        |  SELECT b, SUM(cnt * tp) AS tp, SUM(cnt * pred) AS pred, SUM(cnt * gold) AS gold
        |  FROM counted GROUP BY b
        |)""".stripMargin),

    "a9_slices" -> ErOracle.q(
      """,anaph AS (
        |  SELECT s.cur_id,
        |    CAST(max(CASE WHEN ga2.entity_id = gc2.entity_id THEN 1 ELSE 0 END) AS INT) AS anaphoric
        |  FROM (SELECT DISTINCT ant_id, cur_id FROM scoredall) s
        |  JOIN gold ga2 ON s.ant_id = ga2.mention_id
        |  JOIN gold gc2 ON s.cur_id = gc2.mention_id
        |  GROUP BY 1
        |)
        |SELECT m.mtype,
        |  CAST(CASE WHEN ma.head_key = m.head_key THEN 1 ELSE 0 END AS INT) AS head_match,
        |  an.anaphoric,
        |  CAST(count(*) AS BIGINT) AS n_linked,
        |  CAST(SUM(CASE WHEN ga.entity_id = gc.entity_id THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |  round(CAST(SUM(CASE WHEN ga.entity_id = gc.entity_id THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS acc_r
        |FROM backptrs b
        |JOIN gold gc ON b.cur_id = gc.mention_id
        |JOIN gold ga ON b.ant_id = ga.mention_id
        |JOIN mentions m ON b.cur_id = m.mention_id
        |JOIN mentions ma ON b.ant_id = ma.mention_id
        |JOIN anaph an ON b.cur_id = an.cur_id
        |GROUP BY 1, 2, 3""".stripMargin),

    "s5_model" -> {
      val vals = graft.pipeline.Scoring.FeatureNames.zipWithIndex
        .map { case (f, i) => (f, i, graft.pipeline.Scoring.DefaultWeights.values(i)) }
        .filter(_._3 != 0.0).zipWithIndex
        .map { case ((f, _, w), j) => s"('$f', $j, CAST($w AS DOUBLE))" }
        .mkString(",\n  ")
      s"""SELECT * FROM (VALUES
         |  $vals
         |) AS t(feature, "index", weight)""".stripMargin
    },

    "s5b_sparse_model" -> ErOracle.q(ErOracle.sparseCtes +
      """,
        |spk AS (SELECT f, w_i FROM sw WHERE w_i <> 0)
        |SELECT f, CAST(ROW_NUMBER() OVER (ORDER BY f) - 1 AS BIGINT) AS feature_id, w_i
        |FROM spk""".stripMargin),

    "c1_clusters" -> ErOracle.q(
      "SELECT mention_id, cluster_id FROM clusters"),

    // ST × C1/C2: the Spark side folds the backpointers through the
    // streaming cluster-maintenance kernel in 4 microbatch waves; the oracle
    // is the SAME from-scratch clustering as c1_clusters — hash MATCH proves
    // the incremental fold equals a batch rebuild.
    "c2b_stream_fold" -> ErOracle.q(
      "SELECT mention_id, cluster_id FROM clusters"),

    // C2: the oracle re-clusters the EDITED backpointer table from scratch
    // (fresh ancestor chase), so a hash MATCH proves the Spark side's
    // incremental recompute (touched clusters only) equals a full rebuild.
    "c2_incremental_edit" -> ErOracle.q(
      """,
        |convmin AS (
        |  SELECT conv_id, min(mention_id) AS new_ant FROM mentions GROUP BY conv_id
        |),
        |edits AS (
        |  SELECT b.cur_id, cm.new_ant
        |  FROM backptrs b
        |  JOIN mentions m ON b.cur_id = m.mention_id
        |  JOIN convmin cm ON m.conv_id = cm.conv_id
        |  WHERE md5(b.cur_id) LIKE '0%'
        |),
        |backptrs2 AS MATERIALIZED (
        |  SELECT b.cur_id, coalesce(e.new_ant, b.ant_id) AS ant_id
        |  FROM backptrs b LEFT JOIN edits e ON b.cur_id = e.cur_id
        |  WHERE coalesce(e.new_ant, b.ant_id) <> b.cur_id
        |),
        |anc2 AS (
        |  SELECT cur_id AS id, ant_id AS anc FROM backptrs2
        |  UNION
        |  SELECT a.id, b.ant_id AS anc FROM anc2 a JOIN backptrs2 b ON a.anc = b.cur_id
        |)
        |SELECT m.mention_id, coalesce(min(a.anc), m.mention_id) AS cluster_id
        |FROM mentions m LEFT JOIN anc2 a ON m.mention_id = a.id
        |GROUP BY m.mention_id""".stripMargin),

    "a14_top_weights" -> {
      val vals = graft.pipeline.Scoring.FeatureNames.zipWithIndex
        .map { case (f, i) =>
          s"('$f', CAST($i AS INT), CAST(${graft.pipeline.Scoring.DefaultWeights.values(i)} AS DOUBLE))" }
        .mkString(",\n  ")
      s"""SELECT feature, "index", weight FROM (VALUES
         |  $vals
         |) AS t(feature, "index", weight)
         |ORDER BY abs(weight) DESC, feature ASC LIMIT 10""".stripMargin
    },

    "c3_nonsingletons" -> ErOracle.q(
      """SELECT mention_id, cluster_id FROM (
        |  SELECT mention_id, cluster_id, count(*) OVER (PARTITION BY cluster_id) AS sz
        |  FROM clusters) WHERE sz > 1""".stripMargin),

    "c4_dense_relabel" -> ErOracle.q(
      """,
        |cidx2 AS (
        |  SELECT cluster_id, CAST(ROW_NUMBER() OVER (ORDER BY cluster_id) - 1 AS BIGINT) AS cluster_idx
        |  FROM (SELECT DISTINCT cluster_id FROM clusters)
        |)
        |SELECT c.mention_id, c.cluster_id, i.cluster_idx
        |FROM clusters c JOIN cidx2 i ON c.cluster_id = i.cluster_id""".stripMargin),

    "c5_oracle_clusters" -> ErOracle.q(
      """SELECT mention_id,
        |  'g:' || regexp_extract(conv_id, '^c([0-9]+)-', 1) AS cluster_id
        |FROM mentions""".stripMargin),

    "w2_det_order" -> ErOracle.q(
      """SELECT mention_id,
        |  CAST(ROW_NUMBER() OVER (ORDER BY md5(mention_id)) - 1 AS BIGINT) AS shuffle_rank
        |FROM mentions""".stripMargin),

    "f6_pronouns" -> ErOracle.qAll(
      """SELECT mention_id,
        |  CASE WHEN norm IN ('they', 'them', 'their', 'theirs') THEN 'they'
        |       WHEN norm IN ('he', 'him', 'his') THEN 'he'
        |       WHEN norm IN ('she', 'her', 'hers') THEN 'she'
        |       WHEN norm IN ('it', 'its') THEN 'it'
        |       WHEN norm IN ('i', 'me', 'my', 'mine') THEN 'i'
        |       WHEN norm IN ('we', 'us', 'our', 'ours') THEN 'we'
        |       WHEN norm IN ('you', 'your', 'yours') THEN 'you'
        |       ELSE norm END AS canon,
        |  CASE WHEN norm IN ('i', 'me', 'my', 'mine', 'we', 'us', 'our', 'ours') THEN 'first'
        |       WHEN norm IN ('you', 'your', 'yours') THEN 'second'
        |       WHEN norm IN ('they', 'them', 'their', 'theirs', 'he', 'him', 'his',
        |                     'she', 'her', 'hers', 'it', 'its') THEN 'third'
        |       ELSE 'unknown' END AS person
        |FROM mentions WHERE mtype = 'PRONOMINAL'""".stripMargin),

    "f8_f10_containment" -> ErOracle.qAll(
      """,
        |fsides AS (
        |  SELECT conv_id, turn_idx, mention_id, start, "end",
        |    string_split(norm, ' ') AS toks
        |  FROM mentions
        |)
        |SELECT a.mention_id AS id_a, b.mention_id AS id_b,
        |  CAST(CASE WHEN ((a.start >= b.start AND a."end" <= b."end")
        |              OR (b.start >= a.start AND b."end" <= a."end"))
        |         AND NOT (a.start = b.start AND a."end" = b."end")
        |       THEN 1 ELSE 0 END AS INT) AS iwi,
        |  CAST(CASE WHEN list_contains(b.toks, a.toks[len(a.toks)])
        |         OR list_contains(a.toks, b.toks[len(b.toks)])
        |       THEN 1 ELSE 0 END AS INT) AS fhc
        |FROM fsides a JOIN fsides b
        |  ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
        | AND a.mention_id < b.mention_id""".stripMargin),

    "u2_folds" -> ErOracle.q(
      """SELECT conv_id,
        |  CAST((instr('0123456789abcdef', substr(md5(conv_id), 1, 1)) - 1) % 4 AS INT) AS fold
        |FROM (SELECT DISTINCT conv_id FROM mentions)""".stripMargin),

    "b6_ner_domains" -> ErOracle.qAll(ErOracle.nerCtes + ErOracle.nerFbCtes +
      """,
        |b6cut AS (
        |  SELECT conv_id, turn_idx, pos, m_o_r, m_b_r, m_i_r,
        |    greatest(m_o_r, m_b_r, m_i_r) * exp(-9.0) AS cut
        |  FROM nmarg
        |)
        |SELECT conv_id, turn_idx, pos,
        |  CAST(CASE WHEN m_o_r >= cut THEN 1 ELSE 0 END AS INT) AS keep_o,
        |  CAST(CASE WHEN m_b_r >= cut THEN 1 ELSE 0 END AS INT) AS keep_b,
        |  CAST(CASE WHEN m_i_r >= cut THEN 1 ELSE 0 END AS INT) AS keep_i
        |FROM b6cut""".stripMargin),

    "a3_likelihood" -> ErOracle.q(
      """,
        |a3per AS (
        |  SELECT s.cur_id,
        |    SUM(exp(round(s.score, 6))) + 1.0 AS z,
        |    SUM(CASE WHEN ga.entity_id = gc.entity_id
        |        THEN exp(round(s.score, 6)) ELSE 0.0 END) AS gm
        |  FROM scoredall s
        |  JOIN gold ga ON s.ant_id = ga.mention_id
        |  JOIN gold gc ON s.cur_id = gc.mention_id
        |  GROUP BY s.cur_id
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_mentions,
        |  round(avg(-ln(CASE WHEN gm > 0 THEN gm / z ELSE 1.0 END)), 6) AS loss_r
        |FROM a3per""".stripMargin),

    "a7_mention_prf" -> ErOracle.qAll {
      val prons = graft.pipeline.Mentions.Pronouns.map(p => s"'$p'").mkString(", ")
      s""",
        |identext AS (
        |  SELECT conv_id, turn_idx, pos AS start, pos AS "end" FROM toks
        |  WHERE regexp_matches(tok, '^(?:[A-Za-z]+[#-])?[0-9]+$$') OR lower(tok) IN ($prons)
        |),
        |a7c AS (
        |  SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM identext i JOIN mentions m
        |       ON i.conv_id = m.conv_id AND i.turn_idx = m.turn_idx
        |      AND i.start = m.start AND i."end" = m."end") AS tp,
        |    (SELECT CAST(count(*) AS BIGINT) FROM identext) AS n_pred,
        |    (SELECT CAST(count(*) AS BIGINT) FROM mentions) AS n_gold
        |)
        |SELECT tp, n_pred, n_gold,
        |  round(CAST(tp AS DOUBLE) / n_pred, 6) AS precision_r,
        |  round(CAST(tp AS DOUBLE) / n_gold, 6) AS recall_r,
        |  round(2.0 * (CAST(tp AS DOUBLE) / n_pred) * (CAST(tp AS DOUBLE) / n_gold)
        |    / ((CAST(tp AS DOUBLE) / n_pred) + (CAST(tp AS DOUBLE) / n_gold)), 6) AS f1_r
        |FROM a7c""".stripMargin
    },

    "f7_f11_properties" -> ErOracle.qAll(
      s""",
        |fprops AS (
        |  SELECT mention_id,
        |    CASE WHEN regexp_matches(norm, '^(the|that|this|these|those) ') THEN 'definite'
        |         WHEN regexp_matches(norm, '^(a|an) ') THEN 'indefinite'
        |         ELSE 'bare' END AS definiteness,
        |    ${ErOracle.semClassSql("lasttok")} AS sem_class
        |  FROM (SELECT mention_id, norm,
        |          string_split(norm, ' ')[len(string_split(norm, ' '))] AS lasttok
        |        FROM mentions)
        |)
        |SELECT mention_id, definiteness, sem_class FROM fprops""".stripMargin),

    "a8_pairwise_f1" -> ErOracle.q(
      """SELECT tp, pred_pairs, gold_pairs,
        | round(CAST(tp AS DOUBLE) / pred_pairs, 6) AS precision_r,
        | round(CAST(tp AS DOUBLE) / gold_pairs, 6) AS recall_r,
        | round(2.0 * (CAST(tp AS DOUBLE) / pred_pairs) * (CAST(tp AS DOUBLE) / gold_pairs)
        |   / ((CAST(tp AS DOUBLE) / pred_pairs) + (CAST(tp AS DOUBLE) / gold_pairs)), 6) AS f1_r
        |FROM (
        | SELECT
        |  CAST(SUM(CASE WHEN pc_a = pc_c AND g_a = g_c THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |  CAST(SUM(CASE WHEN pc_a = pc_c THEN 1 ELSE 0 END) AS BIGINT) AS pred_pairs,
        |  CAST(SUM(CASE WHEN g_a = g_c THEN 1 ELSE 0 END) AS BIGINT) AS gold_pairs
        | FROM (
        |  SELECT ca.cluster_id AS pc_a, cc.cluster_id AS pc_c,
        |         ga.entity_id AS g_a, gc.entity_id AS g_c
        |  FROM cpairs p
        |  JOIN clusters ca ON p.ant_id = ca.mention_id
        |  JOIN clusters cc ON p.cur_id = cc.mention_id
        |  JOIN gold ga ON p.ant_id = ga.mention_id
        |  JOIN gold gc ON p.cur_id = gc.mention_id
        | )
        |)""".stripMargin),

    "b7_blocking_recall" -> ErOracle.q(
      s"""SELECT gold_pairs, recalled, round(CAST(recalled AS DOUBLE) / gold_pairs, 6) AS recall_r,
         | (SELECT CAST(count(*) AS BIGINT) FROM (
         |    SELECT norm FROM mentions WHERE NOT closed_class
         |    GROUP BY norm HAVING count(*) > ${ErOracle.MaxSelfMentions})) AS n_capped_surfaces
         |FROM (
         | SELECT CAST(count(*) AS BIGINT) AS gold_pairs,
         |  CAST(SUM(CASE WHEN EXISTS(SELECT 1 FROM cpairs p
         |        WHERE p.ant_id = gp.ant_id AND p.cur_id = gp.cur_id)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS recalled
         | FROM (
         |  SELECT a.mention_id AS ant_id, c.mention_id AS cur_id
         |  FROM mentions a
         |  JOIN gold ga ON a.mention_id = ga.mention_id
         |  JOIN gold gc ON ga.entity_id = gc.entity_id
         |  JOIN mentions c ON c.mention_id = gc.mention_id
         |  WHERE a.mention_id < c.mention_id
         |   AND ((NOT a.closed_class AND NOT c.closed_class)
         |     OR (a.conv_id = c.conv_id AND c.m_seq - a.m_seq > 0
         |         AND c.m_seq - a.m_seq <= ${ErOracle.MaxConvDist}))
         | ) gp
         |)""".stripMargin),

    "a10_muc" -> ErOracle.q(mucBody),

    "a10_bcub" -> ErOracle.q(bcubBody),

    // CoNLL score = mean of the three rounded F1s (`CorefEvaluator
    // .computeRenderCoNLL`, `CorefEvaluator.scala:477-484` — the headline
    // metric of the reference's papers, averaged over MUC, B³, CEAFe).
    "a10_conll" -> ErOracle.q(
      s""",
        |$ceafeCtes,
        |mucv AS ($mucBody),
        |bcv AS ($bcubBody),
        |cev AS ($ceafeBody)
        |SELECT m.muc_f1_r, b.bcub_f1_r, c.ceafe_f1_r,
        |  round((m.muc_f1_r + b.bcub_f1_r + c.ceafe_f1_r) / 3.0, 6) AS conll_f1_r
        |FROM mucv m, bcv b, cev c""".stripMargin),

    "a10_ceafe" -> ErOracle.q(s",\n$ceafeCtes\n$ceafeBody"),

    "a5_lexcounts" -> Transcripts.withCte(
      """SELECT tok, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM transcripts
        |) GROUP BY tok HAVING count(*) >= 20""".stripMargin),

    "a5b_lex_bundle" -> ErOracle.qAll {
      val shape = "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        "regexp_replace(regexp_replace(raw_head, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g')," +
        " '[0-9]', 'd', 'g'), 'X{3,}', 'XXe', 'g'), 'x{3,}', 'xxe', 'g'), 'd{3,}', 'dde', 'g')"
      val cls = """CASE WHEN regexp_matches(raw_head, '^[A-Z][a-z]') THEN 'INITC'
        | WHEN regexp_matches(raw_head, '^[A-Z]+$') THEN 'CAPS'
        | WHEN regexp_matches(raw_head, '^[a-z]+$') THEN 'LC'
        | WHEN regexp_matches(raw_head, '^[0-9]+$') THEN 'NUM'
        | WHEN regexp_matches(raw_head, '-') THEN 'DASH'
        | ELSE 'OTHER' END""".stripMargin.replace("\n", "")
      s""",
        |mtx AS (
        |  SELECT conv_id, turn_idx, start, "end",
        |    string_split(norm, ' ') AS mtoks,
        |    string_split(norm, ' ')[len(string_split(norm, ' '))] AS head_tok,
        |    string_split(surface, ' ')[len(string_split(surface, ' '))] AS raw_head
        |  FROM mentions
        |),
        |lt AS (SELECT conv_id, turn_idx, pos, lower(tok) AS tok FROM toks),
        |a5b AS (
        |  SELECT 'head' AS tbl, head_tok AS key FROM mtx
        |  UNION ALL SELECT 'first', mtoks[1] FROM mtx
        |  UNION ALL SELECT 'last', mtoks[len(mtoks)] FROM mtx
        |  UNION ALL SELECT 'preceding', t.tok FROM mtx m JOIN lt t
        |    ON t.conv_id = m.conv_id AND t.turn_idx = m.turn_idx AND t.pos = m.start - 1
        |  UNION ALL SELECT 'following', t.tok FROM mtx m JOIN lt t
        |    ON t.conv_id = m.conv_id AND t.turn_idx = m.turn_idx AND t.pos = m."end" + 1
        |  UNION ALL SELECT 'preceding_by2', t.tok FROM mtx m JOIN lt t
        |    ON t.conv_id = m.conv_id AND t.turn_idx = m.turn_idx AND t.pos = m.start - 2
        |  UNION ALL SELECT 'following_by2', t.tok FROM mtx m JOIN lt t
        |    ON t.conv_id = m.conv_id AND t.turn_idx = m.turn_idx AND t.pos = m."end" + 2
        |  UNION ALL SELECT 'head_prefix', substr(head_tok, 1, 3) FROM mtx
        |  UNION ALL SELECT 'head_suffix', substr(head_tok, greatest(length(head_tok) - 2, 1), 3) FROM mtx
        |  UNION ALL SELECT 'head_shape', $shape FROM mtx
        |  UNION ALL SELECT 'head_class', $cls FROM mtx
        |  UNION ALL SELECT 'all_tokens', unnest(mtoks) FROM mtx
        |)
        |SELECT tbl AS "table", key, CAST(count(*) AS BIGINT) AS n
        |FROM a5b WHERE key IS NOT NULL AND key <> ''
        |GROUP BY tbl, key HAVING count(*) >= 20""".stripMargin
    },

    "w3_top_heads" -> ErOracle.q(
      """SELECT head_key, CAST(count(*) AS BIGINT) AS n
        |FROM mentions WHERE NOT closed_class
        |GROUP BY head_key ORDER BY n DESC, head_key ASC LIMIT 20""".stripMargin),

    "a16_rollup" -> ErOracle.q(
      """SELECT role, mtype, CAST(count(*) AS BIGINT) AS n
        |FROM mentions GROUP BY ROLLUP(role, mtype)""".stripMargin),

    // training-data pipeline ops
    "dd_exact" -> OpsOracle.ddExact,
    "dd_minhash_lsh" -> OpsOracle.ddMinhashLsh(),
    "dd_canonical" -> OpsOracle.ddCanonical(),
    "dd_ngram_jaccard" -> OpsOracle.ddNgramJaccard(),
    "dd_simhash" -> OpsOracle.ddSimhash(),
    "dd_embedding" -> OpsOracle.ddEmbedding(),
    "sim_topk_brute" -> OpsOracle.simTopKBrute(),
    "sim_ann_lsh" -> OpsOracle.simAnnLsh(),
    "sim_ann_ivf" -> OpsOracle.simAnnIvf(),
    "ta_langid" -> OpsOracle.taLangId,
    "ta_quality" -> OpsOracle.taQuality,
    "ta_token_counts" -> OpsOracle.taTokenCounts,
    "ta_fingerprint" -> OpsOracle.taFingerprint,
    "mm_meta" -> OpsOracle.mmMeta,
  )
}
