package graft

import org.apache.spark.SparkConf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.TableIO
import graft.pipeline._
import graft.sources.Transcripts
import graft.train.ModelIO

/** spark-submit entry point for the record-linkage pipeline (north rule:
  * "launched via spark-submit on a multi-executor cluster"): transcripts in →
  * entity clusters out, with staged checkpoint/resume and a one-line JSON
  * metrics report. This is the operational face of [[Pipeline.run]] — the
  * engine analog of the reference's `Driver` main
  * (`/root/reference/src/main/java/edu/berkeley/nlp/entity/Driver.java`),
  * re-expressed as a cluster job instead of a single-JVM process.
  *
  * {{{
  * spark-submit --class graft.Run graft.jar \
  *   --input  <transcript parquet dir | harness sf dir>      (required)
  *   --output <dir for clusters/ backptrs/ metrics.json>     (required)
  *   [--mode dense|sparse]            default dense
  *   [--model-dir <TableIO dir>]      sparse: packed-model store (S5b)
  *   [--model-token <lineage token>]  sparse: model lineage to load
  *   [--checkpoint <dir>]             stage snapshots; re-run resumes
  *   [--generator all|identifier]     mention generators (M1)
  *   [--link-threshold <double>]      default 0.0
  * }}}
  *
  * Master/executor topology comes from spark-submit; launched bare (no
  * master set) it falls back to `local[*]` for smoke runs. AQE + skew-join
  * handling are enabled here; `spark.sql.shuffle.partitions` is respected
  * if the submitter set it and defaulted to the cluster parallelism
  * otherwise.
  */
object Run {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap

  /** A harness sf dir derives transcripts from `events × customer`; anything
    * else is read as a parquet table of the input-hint schema. */
  private def readTranscripts(spark: SparkSession, input: String): DataFrame =
    if (new java.io.File(s"$input/events.parquet").exists())
      Transcripts.load(spark, input)
    else {
      val df = spark.read.parquet(input)
      val need = Seq("conv_id", "turn_idx", "role", "text")
      val missing = need.filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"input $input is missing transcript columns: ${missing.mkString(", ")}")
      df
    }

  def main(args: Array[String]): Unit = {
    val opt = parseArgs(args)
    val input = opt.getOrElse("input", sys.error("--input is required"))
    val output = opt.getOrElse("output", sys.error("--output is required"))
    val mode = opt.getOrElse("mode", "dense")

    val conf = new SparkConf()
    val builder = SparkSession.builder().appName("graft-er")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    val spark =
      (if (conf.contains("spark.master")) builder else builder.master("local[*]"))
        .getOrCreate()
    if (!conf.contains("spark.sql.shuffle.partitions"))
      spark.conf.set("spark.sql.shuffle.partitions",
        spark.sparkContext.defaultParallelism.toString)
    graft.functions.register(spark)

    val (sparseWeights, sparseTag) =
      if (mode == "sparse") {
        val dir = opt.getOrElse("model-dir",
          sys.error("--mode sparse requires --model-dir (a committed packed model)"))
        val token = opt.getOrElse("model-token",
          sys.error("--mode sparse requires --model-token"))
        val (w, tag) = ModelIO.loadSparse(spark, new TableIO(dir), token)
        (Some(w), tag)
      } else (None, "")

    val cfg = Pipeline.Config(
      mentionGenerator = opt.getOrElse("generator", "all"),
      linkThreshold = opt.get("link-threshold").map(_.toDouble).getOrElse(0.0),
      checkpointDir = opt.get("checkpoint"),
      scoringMode = mode,
      sparseWeights = sparseWeights,
      sparseTag = sparseTag)

    val t0 = System.nanoTime()
    val res = Pipeline.run(spark, readTranscripts(spark, input), cfg)
    // one atomic commit per output table, lineage = the pipeline config token
    val out = new TableIO(output)
    out.commit("clusters", res.clusters, cfg.token)
    out.commit("backptrs", res.backptrs, cfg.token)
    val wallSec = (System.nanoTime() - t0) / 1e9

    val nMentions = res.mentions.count()
    val nClusters = res.clusters.agg(countDistinct(col("cluster_id"))).head.getLong(0)
    val metrics = s"""{"input":"$input","mode":"$mode","config":"${cfg.token}",""" +
      s""""mentions":$nMentions,"clusters":$nClusters,""" +
      f""""wall_sec":$wallSec%.3f}"""
    val w = new java.io.PrintWriter(s"$output/metrics.json")
    try w.println(metrics) finally w.close()
    println(metrics)
    res.unpersist()
    spark.stop()
  }
}
