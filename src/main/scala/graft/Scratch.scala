package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.register(spark)
    def tm[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[t] $tag: ${(System.nanoTime()-t0)/1e9}%.1f s"); a
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(32).cache()
    docs.count()
    // exactly what benchOps runs, uncached intermediate:
    tm("minhash_xxhash")(println("  out=" + Dedup.minhashLsh(Dedup.corpus(docs)).count()))
    tm("minhash_again")(println("  out=" + Dedup.minhashLsh(Dedup.corpus(docs)).count()))
    tm("simhash")(println("  out=" + Dedup.simhash(Dedup.corpus(docs)).count()))
    spark.stop()
  }
}
