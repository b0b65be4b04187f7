package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ingest path (SURVEY.md §2.13). The reference's only streaming
  * shape is the constant-memory one-doc-at-a-time scan + per-doc prediction
  * writer (`ConllDocReader.readConllDocsProcessStreaming`,
  * `EntitySystem.scala:205-214`). Spark-natively:
  *
  *  - mention extraction is stateless per turn → runs unchanged on a stream;
  *  - conversation assembly is a session window on `ts` keyed by `conv_id`
  *    with a watermark for late turns;
  *  - per-conversation running state (dense mention sequence numbers, the
  *    stream analog of the canonical-order window) is
  *    `flatMapGroupsWithState`.
  */
object StreamingAssembly {

  val transcriptSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
    StructField("role", StringType), StructField("text", StringType),
    StructField("tool", StringType), StructField("ts", TimestampType)))

  /** File-stream source over a directory of transcript parquet. */
  def streamTranscripts(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(transcriptSchema).parquet(dir)

  /** Stateless streaming mention extraction — identical logic to the batch
    * identifier generator (mention ids are position-derived, no window). */
  def extractMentions(stream: DataFrame): DataFrame = {
    import graft.pipeline.Mentions.{IdentifierRe, Pronouns}
    stream
      .select(col("conv_id"), col("turn_idx"), col("role"), col("ts"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(col("tok").rlike(IdentifierRe) || lower(col("tok")).isin(Pronouns: _*))
      .select(col("conv_id"), col("turn_idx"), col("pos").as("start"),
        col("tok").as("surface"),
        when(lower(col("tok")).isin(Pronouns: _*), "PRONOMINAL")
          .otherwise("PROPER").as("mtype"),
        graft.functions.mentionId(col("conv_id"), col("turn_idx"), col("pos"))
          .as("mention_id"),
        col("role"), col("ts"))
  }

  /** Conversation sessions: watermarked session window per conv_id —
    * (conv_id, session start/end, n_turns, n_chars). */
  def conversationSessions(stream: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(col("conv_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_turns"), sum(length(col("text"))).as("n_chars"))
      .select(col("conv_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_turns"), col("n_chars"))

  /** Streaming exact dedup: first-seen wins per content hash, late
    * duplicates dropped with watermark-bounded state — the streaming face of
    * the batch hash-groupBy dedup (graft.ops.Dedup.exact). At scale the
    * state store is hash-partitioned by the content key and the watermark
    * bounds it to the dedup horizon. */
  def streamingExactDedup(stream: DataFrame, watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("text_md5", org.apache.spark.sql.functions.md5(col("text").cast("binary")))
      .withWatermark("ts", watermark)
      // dropDuplicatesWithinWatermark (not dropDuplicates): with the plain
      // variant the event-time column is absent from the key set, so the
      // watermark is ignored for state cleanup and the store grows without
      // bound; the WithinWatermark variant keeps first-seen-wins semantics
      // while actually evicting state past the watermark horizon.
      .dropDuplicatesWithinWatermark("text_md5")

  case class BandDoc(bk: String, doc_id: Long, sh: Seq[String], ts: java.sql.Timestamp)
  /** Per-doc event time (ms) rides along so hot buckets can be pruned by
    * watermark on every update, not only by the whole-bucket timeout. */
  case class BucketState(docs: List[(Long, Seq[String], Long)])
  case class NearDupHit(doc_a: Long, doc_b: Long, jacc_r: Double)

  /** Streaming MinHash-LSH near-dup — the streaming face of
    * [[graft.ops.Dedup.minhashLsh]]: shingle → band keys (same
    * `lshBandKeysDirect` expressions as batch) → per-band-bucket keyed state
    * (`flatMapGroupsWithState`) holding the bucket's recent docs; each
    * arriving doc is exact-Jaccard-verified against the bucket state and
    * emits `(doc_a, doc_b, jacc_r)` for hits above the threshold. A pair
    * colliding in several bands emits once per band — consumers `distinct`
    * (the batch operator dedups candidates the same way, just pre-verify).
    *
    * State is bounded two ways: (1) on every update, docs whose event time
    * has fallen more than one horizon behind the current watermark are
    * dropped from the bucket BEFORE the new rows append — so a hot bucket
    * receiving continuous traffic holds at most one horizon's worth of docs
    * and the per-record Jaccard verify stays O(docs-per-horizon), not
    * O(bucket lifetime); (2) a whole-bucket EVENT-TIME TIMEOUT evicts
    * buckets that stop receiving rows entirely. */
  def streamingMinhashNearDup(spark: SparkSession, docs: DataFrame,
      threshold: Double = 0.7, minhashes: Int = 12, bands: Int = 6,
      watermark: String = "10 minutes", horizonMs: Long = 600000L) = {
    import spark.implicits._
    val keyed = docs
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        graft.ops.Dedup.wordShingles(col("text")).as("sh"))
      .select(explode(graft.functions.lshBandKeysDirect(col("sh"), bands,
        minhashes / bands, "xxhash64")).as("bk"),
        col("doc_id"), col("sh"), col("ts"))
      .as[BandDoc]
    keyed.groupByKey(_.bk)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: String, rows: Iterator[BandDoc], state: GroupState[BucketState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty[NearDupHit] }
          else {
            // prune docs that have aged past the watermark horizon FIRST —
            // this is what bounds hot buckets that never stop receiving rows
            // (the timeout below only fires on buckets that go quiet)
            val cutoffMs = state.getCurrentWatermarkMs() - horizonMs
            var cur = state.getOption.map(_.docs).getOrElse(Nil)
              .filter(_._3 >= cutoffMs)
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
            var maxTsMs = 0L
            rows.toSeq.sortBy(_.doc_id).foreach { d =>
              val tsMs = if (d.ts != null) d.ts.getTime else 0L
              maxTsMs = math.max(maxTsMs, tsMs)
              if (!cur.exists(_._1 == d.doc_id)) {
                val shD = d.sh.toSet
                cur.foreach { case (id, sh0, _) =>
                  val s0 = sh0.toSet
                  val inter = s0.intersect(shD).size
                  val uni = s0.size + shD.size - inter
                  val j = if (uni == 0) 0.0 else inter.toDouble / uni
                  if (j >= threshold)
                    out += NearDupHit(math.min(id, d.doc_id), math.max(id, d.doc_id),
                      BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
                }
                cur = (d.doc_id, d.sh, tsMs) :: cur
              }
            }
            state.update(BucketState(cur))
            // eviction must be armed on EVERY update: on the first micro-batch
            // the watermark is still 0, and band-key buckets are mostly
            // singletons that never see another row — skipping the timeout
            // there would leak their state forever. Anchor on max(event time,
            // watermark) + horizon (always > current watermark, as required).
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxTsMs) + horizonMs)
            out.iterator
          }
        })
  }

  case class TurnEvent(conv_id: String, turn_idx: Int, text: String)
  case class SeqState(nextSeq: Int)
  case class SequencedTurn(conv_id: String, turn_idx: Int, m_seq: Int)

  /** Per-conversation running sequence numbers via flatMapGroupsWithState —
    * the streaming analog of the canonical-order window (W1). Turns must
    * arrive in order per conversation (file source preserves batch order;
    * out-of-order handling would buffer by watermark). */
  def sequenceTurns(spark: SparkSession, stream: DataFrame) = {
    import spark.implicits._
    stream.select(col("conv_id"), col("turn_idx"), col("text")).as[TurnEvent]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (convId: String, turns: Iterator[TurnEvent], state: GroupState[SeqState]) => {
          var next = state.getOption.map(_.nextSeq).getOrElse(0)
          val out = turns.toSeq.sortBy(_.turn_idx).map { t =>
            val s = SequencedTurn(convId, t.turn_idx, next); next += 1; s
          }
          state.update(SeqState(next))
          out.iterator
        })
  }
}
