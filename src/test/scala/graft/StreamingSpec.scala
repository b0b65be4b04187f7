package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.fixtures.ErFixture
import graft.streaming.StreamingAssembly

/** Streaming ingest: the stream path must agree with the batch path on the
  * same data (micro-batch equivalence), and session windows / stateful
  * sequencing must behave. */
class StreamingSpec extends SparkSuite {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-stream").toString
    val g = ErFixture.generate(entities = 10, convs = 20, seed = 11L)
    ErFixture.transcriptsDF(spark, g).repartition(3).write.mode("overwrite").parquet(d)
    d
  }

  test("streaming mention extraction == batch extraction on same input") {
    val stream = StreamingAssembly.streamTranscripts(spark, dir)
    val q = StreamingAssembly.extractMentions(stream)
      .writeStream.format("memory").queryName("stream_mentions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("stream_mentions")
      .select("mention_id", "surface", "mtype").orderBy("mention_id").collect().toSeq
    val batch = graft.pipeline.Mentions.extractIdentifier(spark.read.parquet(dir))
      .select("mention_id", "surface", "mtype").orderBy("mention_id").collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("session windows assemble conversations with watermark") {
    val stream = StreamingAssembly.streamTranscripts(spark, dir)
    // complete mode: emit every session at end-of-stream (append would hold
    // back sessions the watermark has not yet closed)
    val q = StreamingAssembly.conversationSessions(stream, gap = "1 hour")
      .writeStream.format("memory").queryName("stream_sessions")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val sessions = spark.table("stream_sessions")
    // every conversation appears; session turn counts sum to the turn count
    val total = sessions.agg(sum("n_turns")).collect()(0).getLong(0)
    val expected = spark.read.parquet(dir).count()
    assert(total === expected)
  }

  test("stateful per-conversation sequencing (flatMapGroupsWithState)") {
    val stream = StreamingAssembly.streamTranscripts(spark, dir)
    val q = StreamingAssembly.sequenceTurns(spark, stream)
      .writeStream.format("memory").queryName("stream_seq")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val seqd = spark.table("stream_seq")
    val bad = seqd.groupBy("conv_id")
      .agg(count(lit(1)).as("n"), countDistinct("m_seq").as("d"),
        min("m_seq").as("mn"), max("m_seq").as("mx"))
      .filter(col("n") =!= col("d") || col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.count() === 0, "m_seq must be dense 0..n-1 per conversation")
  }

  test("streaming minhash near-dup == batch minhashLsh pair set") {
    // corpus with planted near/exact dups (same generator as the batch op)
    val corpus = graft.ops.Dedup.corpus(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("doc_id") * 1000))
      .select("doc_id", "text", "ts")
    val d = Files.createTempDirectory("graft-neardup").toString
    corpus.repartition(3).write.mode("overwrite").parquet(d)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP").parquet(d)
    val q = StreamingAssembly.streamingMinhashNearDup(spark, stream)
      .writeStream.format("memory").queryName("stream_neardup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("stream_neardup")
      .select("doc_a", "doc_b", "jacc_r").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val batch = graft.ops.Dedup.minhashLsh(
      graft.ops.Dedup.corpus(spark.read.parquet("/root/testdata/sf0.001/documents.parquet")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(streamed.keySet === batch.keySet,
      s"streamed pair set must equal batch (streamed ${streamed.size}, batch ${batch.size})")
    assert(batch.nonEmpty)
    streamed.foreach { case (k, j) =>
      assert(math.abs(j - batch(k)) < 1e-9, s"jaccard mismatch on $k") }
  }

  test("streaming band scoring + decode == batch band + decode on replay") {
    import graft.pipeline.{Mentions, Blocking, Scoring, Decode}
    val transcripts = spark.read.parquet(dir)
    val m = Mentions.extractIdentifier(transcripts).cache()
    val cfg = Blocking.Config()
    val batchScores = Scoring.scorePairs(
      Blocking.convBandPairs(m, cfg), m)
      .select(col("ant_id"), col("cur_id"), round(col("score"), 9).as("score"))
      .cache()
    val batchBptr = Decode.backpointers(
      Scoring.scorePairs(Blocking.convBandPairs(m, cfg), m), 0.0)
      .select("cur_id", "ant_id").collect().map(r => r.getString(0) -> r.getString(1)).toMap

    // replay the enriched mentions as a file stream; ONE file per conv order
    // is not needed — the stateful sequencer sorts within the batch
    val md = Files.createTempDirectory("graft-band").toString
    m.select("conv_id", "mention_id", "turn_idx", "start", "norm", "head_key",
      "toks", "mtype", "closed_class", "role", "number", "gender", "ts")
      .coalesce(1).write.mode("overwrite").parquet(md)
    val stream = spark.readStream.schema(
      "conv_id STRING, mention_id STRING, turn_idx INT, start INT, norm STRING, " +
        "head_key STRING, toks ARRAY<STRING>, mtype STRING, closed_class BOOLEAN, " +
        "role STRING, number STRING, gender STRING, ts TIMESTAMP").parquet(md)
    val q = StreamingAssembly.streamingBandScores(spark, stream,
      maxConvDist = cfg.maxConvDist)
      .writeStream.format("memory").queryName("stream_band")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamedScores = spark.table("stream_band")
      .select(col("ant_id"), col("cur_id"), round(col("score"), 9).as("score"))
    val nBatch = batchScores.count()
    assert(nBatch > 0)
    assert(streamedScores.count() === nBatch)
    assert(streamedScores.exceptAll(batchScores).count() === 0L,
      "streamed band scores must equal the batch band scores exactly")

    // decode phase: stream the scored arcs through the running argmax
    val sd = Files.createTempDirectory("graft-banddec").toString
    spark.table("stream_band").coalesce(1).write.mode("overwrite").parquet(sd)
    val arcStream = spark.readStream.schema(
      "ant_id STRING, cur_id STRING, block_key STRING, score DOUBLE, ts TIMESTAMP")
      .parquet(sd)
    val q2 = StreamingAssembly.streamingDecode(spark, arcStream, 0.0)
      .writeStream.format("memory").queryName("stream_decode")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(180000)
    // one emission per improvement; the LAST per cur is the decode
    val streamedBptr = spark.table("stream_decode")
      .groupBy(col("cur_id"))
      .agg(min_by(col("ant_id"), struct(negate(col("score")), col("ant_id"))).as("ant_id"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(streamedBptr === batchBptr,
      s"streaming decode must equal batch backpointers (${streamedBptr.size} vs ${batchBptr.size})")
  }

  test("END-TO-END raw transcript stream -> mentions -> band scores == batch") {
    import graft.pipeline.{Mentions, Blocking, Scoring}
    // the full streaming chain from RAW transcripts: extract (stateless) →
    // enrich with the batch property expressions (stateless) → stateful band
    // pairing + sequencing → the batch scoring expressions, stateless
    val stream = StreamingAssembly.streamTranscripts(spark, dir)
    val enriched = StreamingAssembly.enrichMentions(
      StreamingAssembly.extractMentions(stream))
    val q = StreamingAssembly.streamingBandScores(spark, enriched)
      .writeStream.format("memory").queryName("stream_e2e_band")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("stream_e2e_band")
      .select(col("ant_id"), col("cur_id"), round(col("score"), 9).as("score"))
    val m = Mentions.extractIdentifier(spark.read.parquet(dir))
    val batch = Scoring.scorePairs(Blocking.convBandPairs(m, Blocking.Config()), m)
      .select(col("ant_id"), col("cur_id"), round(col("score"), 9).as("score"))
    assert(batch.count() > 0)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L,
      "end-to-end streamed band scores must equal the batch band scores")
  }

  test("streaming exact dedup == batch exact dedup survivor set") {
    val stream = StreamingAssembly.streamTranscripts(spark, dir)
    val q = StreamingAssembly.streamingExactDedup(stream)
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamedHashes = spark.table("stream_dedup")
      .select("text_md5").distinct().collect().map(_.getString(0)).toSet
    val batchHashes = spark.read.parquet(dir)
      .select(md5(col("text").cast("binary")).as("h")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(streamedHashes === batchHashes,
      "streaming dedup must keep exactly one row per distinct text")
    assert(spark.table("stream_dedup").count() === batchHashes.size.toLong)
  }
}
