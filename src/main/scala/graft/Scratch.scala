package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline._
import graft.sources.Transcripts

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.register(spark)
    val t = Transcripts.load(spark, "/root/testdata/sf0.001")
    val res = Pipeline.run(spark, t, Pipeline.Config(mentionGenerator = "identifier"))

    println("=== scan pushdown (documents filter) ===")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 7 === 0).select("doc_id", "text")
      .explain("formatted")

    println("=== surface scores plan ===")
    res.surfaceScores.explain("formatted")

    println("=== scored (band + expansion) plan ===")
    res.scored.explain("formatted")
    spark.stop()
  }
}
