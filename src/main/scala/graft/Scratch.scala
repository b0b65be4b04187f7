package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline._
import graft.sources.Transcripts

/** Ad-hoc plan/size diagnostics (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.functions.register(spark)
    val t = Transcripts.load(spark, sfDir).cache()
    val m = Mentions.extractIdentifier(t).cache()
    println(s"mentions=${m.count()}")
    val surfaces = Blocking.surfaceTable(m)
    val keys = Blocking.blockKeys(surfaces)
    val stats = Blocking.blockStats(keys, surfaces).cache()
    stats.orderBy(desc("mention_mass")).show(20, false)
    println("kept-key pair mass by prefix:")
    stats.filter(!col("oversize"))
      .groupBy(substring(col("block_key"), 1, 2).as("kind"))
      .agg(count(lit(1)).as("keys"),
        sum(col("n_surfaces") * (col("n_surfaces") - 1) / 2).as("surface_pair_mass"),
        max(col("n_surfaces")).as("max_sz"), max(col("mention_mass")).as("max_mass"))
      .show(false)
    def tm[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[t] $tag: ${(System.nanoTime()-t0)/1e9}%.1f s"); a
    }
    val cfg = Blocking.Config()
    val sp = tm("surfacePairs")({ val p = Blocking.surfacePairs(surfaces, cfg).cache(); println(s"  n=${p.count()}"); p })
    val ss = tm("surfaceScores")({ val x = Scoring.scoreSurfacePairs(sp, surfaces).cache(); println(s"  n=${x.count()}"); x })
    val band = tm("bandPairs")({ val b = Blocking.convBandPairs(m, cfg).cache(); println(s"  n=${b.count()}"); b })
    val bandScored = tm("bandScore")({ val b = Scoring.scorePairs(band, m).cache(); println(s"  n=${b.count()}"); b })
    val linked = ss.filter(col("score") > 0.0)
    val glob = tm("expand")({ val g = Blocking.expandToMentionPairs(linked, m, cfg, Seq("score")).cache(); println(s"  n=${g.count()}"); g })
    spark.stop()
  }
}
