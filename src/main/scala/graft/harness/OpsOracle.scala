package graft.harness

/** DuckDB oracle SQL for the training-data-pipeline operators (Dedup,
  * Similarity, TextAnalysis, Multimodal) — independent re-implementations in
  * the DuckDB dialect of exactly what the Spark operators compute, including
  * the planted-duplicate corpora and the bit-reproducible 64-term dot
  * products (see graft.ops.Similarity). */
object OpsOracle {

  /** documents + planted near (drop first token, +1e6) and exact (+2e6) dups
    * — mirrors graft.ops.Dedup.corpus. */
  val docCorpusCte: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, substr(text, position(' ' IN text) + 1) AS text
      |  FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0
      |)""".stripMargin

  /** Word 3-gram shingles — mirrors Dedup.wordShingles. */
  val wordShinglesCte: String =
    """wsh AS (
      |  SELECT doc_id, text,
      |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |         ELSE list_transform(range(1, len(toks) - 1),
      |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS sh
      |  FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM corpus)
      |)""".stripMargin

  val jaccExpr: String =
    """CAST(len(list_intersect(list_distinct(l.sh_a), list_distinct(r.sh_b))) AS DOUBLE)
      | / (len(list_distinct(l.sh_a)) + len(list_distinct(r.sh_b))
      |    - len(list_intersect(list_distinct(l.sh_a), list_distinct(r.sh_b))))"""
      .stripMargin.replace("\n", "")

  val ddExact: String =
    s"""WITH $docCorpusCte
       |SELECT md5(text) AS text_md5, CAST(count(*) AS BIGINT) AS n_docs,
       |       min(doc_id) AS keep_doc_id
       |FROM corpus GROUP BY md5(text) HAVING count(*) > 1""".stripMargin

  def ddMinhashLsh(threshold: Double = 0.7, minhashes: Int = 12, bands: Int = 6): String = {
    val rpb = minhashes / bands
    val sigCols = (0 until minhashes)
      .map(i => s"list_min(list_transform(sh, s -> md5('$i:' || s))) AS h$i").mkString(",\n    ")
    val bandKeys = (0 until bands).map { b =>
      val hs = (0 until rpb).map(r => s"h${b * rpb + r}")
      s"SELECT ${(s"'b$b'" +: hs).mkString(" || ':' || ")} AS bk, doc_id FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH $docCorpusCte,
       |$wordShinglesCte,
       |sigs AS (SELECT doc_id, $sigCols FROM wsh),
       |keyed AS (
       |  $bandKeys
       |),
       |cands AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM keyed l JOIN keyed r ON l.bk = r.bk AND l.doc_id < r.doc_id
       |  GROUP BY l.doc_id, r.doc_id
       |)
       |SELECT doc_a, doc_b, round(jacc, 6) AS jacc_r FROM (
       |  SELECT c.doc_a, c.doc_b, $jaccExpr AS jacc
       |  FROM cands c
       |  JOIN (SELECT doc_id, sh AS sh_a FROM wsh) l ON c.doc_a = l.doc_id
       |  JOIN (SELECT doc_id, sh AS sh_b FROM wsh) r ON c.doc_b = r.doc_id
       |) WHERE jacc >= $threshold""".stripMargin
  }

  /** Near-dup canonicalization: the minhash pair pipeline feeding a general
    * connected-components closure (recursive reach-min over symmetric
    * edges) — mirrors graft.ops.Dedup.canonicalize over minhashLsh pairs. */
  def ddCanonical(threshold: Double = 0.7, minhashes: Int = 12, bands: Int = 6): String = {
    val rpb = minhashes / bands
    val sigCols = (0 until minhashes)
      .map(i => s"list_min(list_transform(sh, s -> md5('$i:' || s))) AS h$i").mkString(",\n    ")
    val bandKeys = (0 until bands).map { b =>
      val hs = (0 until rpb).map(r => s"h${b * rpb + r}")
      s"SELECT ${(s"'b$b'" +: hs).mkString(" || ':' || ")} AS bk, doc_id FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH RECURSIVE $docCorpusCte,
       |$wordShinglesCte,
       |sigs AS (SELECT doc_id, $sigCols FROM wsh),
       |keyed AS (
       |  $bandKeys
       |),
       |cands AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM keyed l JOIN keyed r ON l.bk = r.bk AND l.doc_id < r.doc_id
       |  GROUP BY l.doc_id, r.doc_id
       |),
       |dpairs AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT c.doc_a, c.doc_b, $jaccExpr AS jacc
       |    FROM cands c
       |    JOIN (SELECT doc_id, sh AS sh_a FROM wsh) l ON c.doc_a = l.doc_id
       |    JOIN (SELECT doc_id, sh AS sh_b FROM wsh) r ON c.doc_b = r.doc_id
       |  ) WHERE jacc >= $threshold
       |),
       |dedges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM dpairs
       |  UNION SELECT doc_b, doc_a FROM dpairs
       |),
       |reach AS (
       |  SELECT src AS id, dst AS r FROM dedges
       |  UNION
       |  SELECT rc.id, e.dst AS r FROM reach rc JOIN dedges e ON e.src = rc.r
       |)
       |SELECT id AS doc_id, least(min(r), id) AS canonical_id
       |FROM reach GROUP BY id""".stripMargin
  }

  def ddNgramJaccard(threshold: Double = 0.7, minhashes: Int = 12,
      bands: Int = 6): String = {
    val rpb = minhashes / bands
    val sigCols = (0 until minhashes)
      .map(i => s"list_min(list_transform(sh, s -> md5('$i:' || s))) AS h$i").mkString(",\n    ")
    val bandKeys = (0 until bands).map { b =>
      val hs = (0 until rpb).map(r => s"h${b * rpb + r}")
      s"SELECT ${(s"'b$b'" +: hs).mkString(" || ':' || ")} AS bk, doc_id FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH $docCorpusCte,
       |$wordShinglesCte,
       |banded AS (SELECT doc_id, sh, CAST(floor(length(text) / 16) AS BIGINT) AS b0 FROM wsh),
       |sigs AS (SELECT doc_id, $sigCols FROM wsh),
       |bks AS (
       |  $bandKeys
       |),
       |keyed AS (
       |  SELECT b.doc_id, CAST(u.bucket AS STRING) || '|' || k.bk AS key
       |  FROM banded b
       |  JOIN (SELECT doc_id, unnest([b0, b0 + 1]) AS bucket FROM banded) u ON b.doc_id = u.doc_id
       |  JOIN bks k ON b.doc_id = k.doc_id
       |),
       |cands AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM keyed l JOIN keyed r ON l.key = r.key AND l.doc_id < r.doc_id
       |  GROUP BY l.doc_id, r.doc_id
       |)
       |SELECT doc_a, doc_b, round(jacc, 6) AS jacc_r FROM (
       |  SELECT c.doc_a, c.doc_b, $jaccExpr AS jacc
       |  FROM cands c
       |  JOIN (SELECT doc_id, sh AS sh_a FROM banded) l ON c.doc_a = l.doc_id
       |  JOIN (SELECT doc_id, sh AS sh_b FROM banded) r ON c.doc_b = r.doc_id
       |) WHERE jacc >= $threshold""".stripMargin
  }

  /** Portable md5-nibble SimHash (two 32-bit halves) — mirrors
    * graft.ops.Dedup.simhashPortable. */
  def ddSimhash(maxHamming: Int = 3): String = {
    def half(offset: Int): String = (0 until 32).map { b =>
      val nib = (offset + b) / 4 + 1
      val bit = (offset + b) % 4
      s"""(CASE WHEN list_sum(list_transform(nibs,
         | nv -> CASE WHEN (nv[$nib] >> $bit) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         | THEN (1::BIGINT << $b) ELSE 0::BIGINT END)""".stripMargin.replace("\n", "")
    }.mkString("\n    + ")
    s"""WITH $docCorpusCte,
       |$wordShinglesCte,
       |hexes AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hx FROM wsh),
       |nibsrc AS (
       |  SELECT doc_id, list_transform(hx, h -> list_transform(range(1, 17),
       |    i -> CAST(instr('0123456789abcdef', substr(h, i, 1)) - 1 AS INT))) AS nibs
       |  FROM hexes
       |),
       |hashes AS (
       |  SELECT doc_id,
       |    ${half(32)} AS h_hi,
       |    ${half(0)} AS h_lo
       |  FROM nibsrc
       |),
       |keyed AS (
       |  SELECT doc_id, h_hi, h_lo, unnest([
       |    '0:' || CAST(h_lo & 65535 AS STRING),
       |    '1:' || CAST((h_lo >> 16) & 65535 AS STRING),
       |    '2:' || CAST(h_hi & 65535 AS STRING),
       |    '3:' || CAST((h_hi >> 16) & 65535 AS STRING)]) AS bk
       |  FROM hashes
       |)
       |SELECT doc_a, doc_b, hamming FROM (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |    min(CAST(bit_count(xor(l.h_hi, r.h_hi)) + bit_count(xor(l.h_lo, r.h_lo)) AS INT)) AS hamming
       |  FROM keyed l JOIN keyed r ON l.bk = r.bk AND l.doc_id < r.doc_id
       |  GROUP BY l.doc_id, r.doc_id
       |) WHERE hamming <= $maxHamming""".stripMargin
  }

  // ---- embeddings ---------------------------------------------------------

  private def dotSql(a: String, b: String): String =
    (1 to graft.ops.Similarity.Dim).map(i => s"$a[$i] * $b[$i]").mkString(" + ")

  /** embeddings corpus with planted near-dups and precomputed norms —
    * mirrors graft.ops.Similarity.corpus. */
  val embCorpusCte: String = {
    val d = graft.ops.Similarity.Dim
    s"""ecorpus0 AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS vec_id,
       |    list_concat([CAST(embedding[1] AS DOUBLE) + 0.05],
       |      list_transform(embedding[2:$d], x -> CAST(x AS DOUBLE))) AS emb
       |  FROM embeddings WHERE vec_id % 9 = 0
       |),
       |ecorpus AS (SELECT vec_id, emb, sqrt(${dotSql("emb", "emb")}) AS nrm FROM ecorpus0)"""
      .stripMargin
  }

  def simTopKBrute(k: Int = 5, queryMod: Int = 50): String =
    s"""WITH $embCorpusCte,
       |cosed AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS nb_id,
       |    round((${dotSql("q.emb", "c.emb")}) / (q.nrm * c.nrm), 6) AS cos_r
       |  FROM ecorpus q JOIN ecorpus c ON q.vec_id % $queryMod = 0 AND q.vec_id <> c.vec_id
       |)
       |SELECT q_id, nb_id, cos_r, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, nb_id ASC) AS INT) AS rank
       |  FROM cosed
       |) WHERE rank <= $k""".stripMargin

  /** Multi-table sign-LSH key legs — mirrors graft.ops.Similarity.lshKeys
    * (plane values are the same seeded plan literals). */
  private def lshKeyedSql(bits: Int, tables: Int, seed: Long): String =
    (0 until tables).map { t =>
      val planes = graft.ops.Similarity.hyperplanes(bits, seed + t)
      val bucketExpr = planes.map { p =>
        val dot = (1 to graft.ops.Similarity.Dim)
          .map(i => s"emb[$i] * ${p(i - 1)}").mkString(" + ")
        s"(CASE WHEN ($dot) >= 0 THEN '1' ELSE '0' END)"
      }.mkString(" || ")
      s"SELECT vec_id, '$t:' || $bucketExpr AS bucket FROM ecorpus"
    }.mkString("\n  UNION ALL\n  ")

  def simAnnLsh(k: Int = 5, queryMod: Int = 50, bits: Int = 8,
      seed: Long = 42L, tables: Int = 4): String =
    s"""WITH $embCorpusCte,
       |keyed AS (
       |  ${lshKeyedSql(bits, tables, seed)}
       |),
       |cands AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS nb_id
       |  FROM keyed q JOIN keyed c
       |    ON q.bucket = c.bucket AND q.vec_id % $queryMod = 0 AND q.vec_id <> c.vec_id
       |  GROUP BY q.vec_id, c.vec_id
       |),
       |cosed AS (
       |  SELECT cd.q_id, cd.nb_id,
       |    round((${dotSql("q.emb", "c.emb")}) / (q.nrm * c.nrm), 6) AS cos_r
       |  FROM cands cd
       |  JOIN ecorpus q ON cd.q_id = q.vec_id
       |  JOIN ecorpus c ON cd.nb_id = c.vec_id
       |)
       |SELECT q_id, nb_id, cos_r, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, nb_id ASC) AS INT) AS rank
       |  FROM cosed
       |) WHERE rank <= $k""".stripMargin

  /** IVF ANN — mirrors graft.ops.Similarity.annIvf (md5-order sampled
    * centroids, cosine cell assignment with `probes` probes). */
  def simAnnIvf(k: Int = 5, queryMod: Int = 50, cells: Int = 16,
      probes: Int = 2): String =
    s"""WITH $embCorpusCte,
       |cents AS (
       |  SELECT vec_id AS cell_id, emb AS c_emb, nrm AS c_nrm
       |  FROM ecorpus ORDER BY md5(CAST(vec_id AS STRING)) LIMIT $cells
       |),
       |assigned AS (
       |  SELECT vec_id, cell_id FROM (
       |    SELECT v.vec_id, c.cell_id,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY (${dotSql("v.emb", "c.c_emb")}) / (v.nrm * c.c_nrm) DESC,
       |                 c.cell_id ASC) AS rn
       |    FROM ecorpus v CROSS JOIN cents c
       |  ) WHERE rn <= $probes
       |),
       |cands AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS nb_id
       |  FROM assigned q JOIN assigned c
       |    ON q.cell_id = c.cell_id AND q.vec_id % $queryMod = 0 AND q.vec_id <> c.vec_id
       |  GROUP BY q.vec_id, c.vec_id
       |),
       |cosed AS (
       |  SELECT cd.q_id, cd.nb_id,
       |    round((${dotSql("q.emb", "c.emb")}) / (q.nrm * c.nrm), 6) AS cos_r
       |  FROM cands cd
       |  JOIN ecorpus q ON cd.q_id = q.vec_id
       |  JOIN ecorpus c ON cd.nb_id = c.vec_id
       |)
       |SELECT q_id, nb_id, cos_r, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, nb_id ASC) AS INT) AS rank
       |  FROM cosed
       |) WHERE rank <= $k""".stripMargin

  def ddEmbedding(threshold: Double = 0.99, bits: Int = 8,
      seed: Long = 42L, tables: Int = 4): String =
    s"""WITH $embCorpusCte,
       |keyed AS (
       |  ${lshKeyedSql(bits, tables, seed)}
       |),
       |cands AS (
       |  SELECT l.vec_id AS vec_a, r.vec_id AS vec_b
       |  FROM keyed l JOIN keyed r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
       |  GROUP BY l.vec_id, r.vec_id
       |)
       |SELECT vec_a, vec_b, round(cos, 6) AS cos_r FROM (
       |  SELECT c.vec_a, c.vec_b,
       |    (${dotSql("a.emb", "b.emb")}) / (a.nrm * b.nrm) AS cos
       |  FROM cands c
       |  JOIN ecorpus a ON c.vec_a = a.vec_id
       |  JOIN ecorpus b ON c.vec_b = b.vec_id
       |) WHERE cos >= $threshold""".stripMargin

  // ---- text analysis (over raw documents) ---------------------------------

  private def inList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString(", ")
  private def hitsSql(dict: Seq[String]) =
    s"CAST(len(list_filter(toks, t -> t IN (${inList(dict)}))) AS INT)"

  val taLangId: String = {
    import graft.ops.TextAnalysis._
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       |h AS (SELECT doc_id, ${hitsSql(StopEn)} AS h_en, ${hitsSql(StopEs)} AS h_es,
       |        ${hitsSql(StopFr)} AS h_fr, ${hitsSql(StopDe)} AS h_de FROM t)
       |SELECT doc_id, h_en, h_es, h_fr, h_de,
       |  CASE WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de AND h_en > 0 THEN 'en'
       |       WHEN h_es >= h_fr AND h_es >= h_de AND h_es > 0 THEN 'es'
       |       WHEN h_fr >= h_de AND h_fr > 0 THEN 'fr'
       |       WHEN h_de > 0 THEN 'de'
       |       ELSE 'und' END AS lang_pred
       |FROM h""".stripMargin
  }

  val taQuality: String = {
    import graft.ops.TextAnalysis._
    s"""WITH t AS (
       |  SELECT doc_id, text, string_split(lower(text), ' ') AS toks,
       |    CAST(length(text) AS DOUBLE) AS text_len,
       |    CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) AS alnum_len,
       |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS digit_len
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
       |    (text_len - alnum_len - (CAST(len(toks) AS DOUBLE) - 1)) / text_len AS punct_ratio,
       |    ${hitsSql(StopEn)} / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
       |    alnum_len / CAST(len(toks) AS DOUBLE) AS mean_token_len,
       |    CAST(len(toks) AS DOUBLE) AS n_toks_d, text_len, digit_len
       |  FROM t)
       |SELECT doc_id, n_tokens, round(punct_ratio, 6) AS punct_ratio,
       |  round(stopword_ratio, 6) AS stopword_ratio,
       |  round(mean_token_len, 6) AS mean_token_len,
       |  round(1.0 / (1.0 + exp(-(-1.0 + stopword_ratio * 4.0
       |    + least(n_toks_d / 100.0, 1.0) * 2.0 - punct_ratio * 3.0
       |    - (digit_len / text_len) * 2.0
       |    + (CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 8.0
       |            THEN 0.5 ELSE -0.5 END)))), 6) AS quality
       |FROM f""".stripMargin
  }

  val taTokenCounts: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INT) AS bpeish_tokens,
      |  CAST(length(text) AS INT) AS n_chars
      |FROM documents""".stripMargin

  val taFingerprint: String =
    """WITH s AS (
      |  SELECT doc_id,
      |    CASE WHEN length(lower(text)) < 5 THEN [lower(text)]
      |         ELSE list_transform(range(1, length(lower(text)) - 3),
      |                i -> substr(lower(text), i, 5)) END AS sh
      |  FROM documents)
      |SELECT doc_id, list_min(list_transform(sh, x -> md5(x))) AS fp_min,
      |  md5(array_to_string(list_sort(list_distinct(sh)), '')) AS fp_set,
      |  CAST(len(list_distinct(sh)) AS INT) AS n_distinct_shingles
      |FROM s""".stripMargin

  val mmMeta: String =
    """SELECT doc_id,
      |  CAST(octet_length(from_hex(md5(text))) AS INT) AS n_bytes,
      |  16 + ascii(substr(md5(text), 1, 1)) AS width,
      |  16 + ascii(substr(md5(text), 2, 1)) AS height,
      |  'fake/rgb8' AS media_type
      |FROM documents""".stripMargin
}
