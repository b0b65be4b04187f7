package graft
import org.apache.spark.sql.functions._
import graft.pipeline._
import graft.sources.Transcripts

/** One-off plan auditor (dev tool): prints formatted plans of the hot stages
  * to check whole-stage-codegen spans and scan-level pushdown. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.register(spark)
    val sfDir = "/root/testdata/sf0.001"
    val t = Transcripts.load(spark, sfDir).repartition(8, col("conv_id"))
    val m = Mentions.extractIdentifier(t).cache(); m.count()
    val band = Scoring.scorePairs(Blocking.convBandPairs(m), m)
    println("=== band scoring ==="); band.explain("formatted")
    // scan pushdown check: projection + filter on a parquet base table
    Transcripts.registerBase(spark, sfDir)
    val scan = spark.table("documents").filter(col("doc_id") % 7 === 0)
      .select("doc_id", "text")
    println("=== doc scan ==="); scan.explain("formatted")
    spark.stop()
  }
}
