package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline._
import graft.sources.Transcripts

/** Dev-only cost probe: streaming cluster fold vs batch clustering at an sf
  * dir (used to size the bench's `st_cluster_fold` surface and its per-wave
  * accounting honestly). Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.register(spark)
    val sf = sys.env.getOrElse("SF", "/root/testdata/sf0.1")

    // cost probe: streaming cluster fold at sf0.1 vs the batch clustering
    val t = Transcripts.load(spark, sf)
      .repartition(32, col("conv_id")).cache()
    t.count()
    val res = Pipeline.run(spark, t, Pipeline.Config(mentionGenerator = "identifier"))
    val m = res.mentions
    val bptr = res.backptrs.localCheckpoint(true)
    println(s"bptr rows=${bptr.count()}")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val batchClusters = time("batch C1 cluster") {
      val c = Clustering.cluster(spark, m, bptr).localCheckpoint(true)
      c.count(); c
    }

    // conversation-sliced waves: the realistic arrival shape — a batch
    // touches only its own conversations' clusters (+ cross-conv chains).
    // Two passes to see variance (the bench's min-of-two discipline).
    import graft.streaming.StreamingClusters
    val waves = 4
    var st2 = StreamingClusters.empty(spark)
    for (pass <- 1 to 2) {
      st2 = StreamingClusters.empty(spark)
      time(s"pass $pass: streaming fold total (4 conv waves)") {
        for (w <- 0 until waves) {
          val slice = bptr.filter(
            pmod(xxhash64(graft.functions.convOfMentionId(col("cur_id"))), lit(waves)) === w)
            .select(col("cur_id"), col("ant_id"), col("score"))
          st2 = time(s"  conv wave $w") { StreamingClusters.update(spark, st2, slice) }
        }
      }
      if (pass == 1) {
        val diff = st2.clusters.join(batchClusters.withColumnRenamed("cluster_id", "b"),
          Seq("mention_id")).filter(col("cluster_id") =!= col("b")).count()
        println(s"label diff vs batch (on common ids)=$diff")
        st2.pins.foreach(id => spark.sparkContext.getPersistentRDDs.get(id)
          .foreach(_.unpersist(false)))
      }
    }
    println(s"streaming clusters rows=${st2.clusters.count()}")
    spark.stop()
  }
}
