package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S4 formatted sink — the CoNLL writer analog
  * (`/root/reference/.../ConllDocWriter.scala:19-44`): token-per-line text
  * with tab-separated `conv_id  turn_idx  pos  token  coref_bit`, where the
  * coref bit is `(<cluster>)` on single-token mentions, `(<cluster>` /
  * `<cluster>)` on multi-token boundaries, `-` elsewhere — derived by joining
  * the cluster assignment back to mention extents, exactly the writer's
  * grafting step. Lines are emitted per conversation partition
  * (`partitionBy` on the write) so a conversation is never split across
  * files. [[parse]] inverts the format (round-trip tested). */
object ConllWriter {

  /** Render `(conv_id, turn_idx, pos, tok, bit)` lines. `mentions` needs
    * (mention_id, conv_id, turn_idx, start, end); `clusters`
    * (mention_id, cluster_id). */
  def formatLines(transcripts: DataFrame, mentions: DataFrame,
      clusters: DataFrame): DataFrame = {
    val toks = transcripts.select(col("conv_id"), col("turn_idx"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val m = mentions.join(clusters, "mention_id")
      .select(col("conv_id"), col("turn_idx"), col("start"), col("end"),
        col("cluster_id"))
    val open = m.select(col("conv_id"), col("turn_idx"), col("start").as("pos"),
      when(col("start") === col("end"),
        concat(lit("("), col("cluster_id"), lit(")")))
        .otherwise(concat(lit("("), col("cluster_id"))).as("bit"))
    val close = m.filter(col("start") =!= col("end"))
      .select(col("conv_id"), col("turn_idx"), col("end").as("pos"),
        concat(col("cluster_id"), lit(")")).as("bit"))
    val bits = open.unionByName(close)
      .groupBy(col("conv_id"), col("turn_idx"), col("pos"))
      // collect_list order is nondeterministic — sort before joining so the
      // written bytes are stable when multiple mentions open/close on one
      // token. Sort key puts CLOSES before opens: when extents of the SAME
      // cluster meet at a boundary token ("C)" + "(C"), the reader's LIFO
      // bracket matching must pop the finished extent before the new one
      // pushes, or it would pair the brackets across the two mentions.
      .agg(concat_ws("|", transform(
        array_sort(collect_list(struct(
          when(col("bit").startsWith("("), "1").otherwise("0").as("k"),
          col("bit")))),
        s => s.getField("bit"))).as("bit"))
    toks.join(bits, Seq("conv_id", "turn_idx", "pos"), "left")
      .select(col("conv_id"), col("turn_idx"), col("pos"), col("tok"),
        coalesce(col("bit"), lit("-")).as("bit"))
      .withColumn("line", concat_ws("\t",
        col("conv_id"), col("turn_idx"), col("pos"), col("tok"), col("bit")))
  }

  /** Write the formatted lines partitioned by conversation bucket. */
  def write(lines: DataFrame, path: String, buckets: Int = 16): Unit =
    lines
      .withColumn("bucket", pmod(xxhash64(col("conv_id")), lit(buckets)))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"), col("pos"))
      .select(col("line"))
      .write.mode("overwrite").text(path)

  /** Parse written lines back into (conv_id, turn_idx, pos, tok, bit) —
    * the reader side of the round trip (S1's column split). */
  def parse(lines: DataFrame): DataFrame =
    lines.select(split(col("value"), "\t").as("c"))
      .select(col("c").getItem(0).as("conv_id"),
        col("c").getItem(1).cast("int").as("turn_idx"),
        col("c").getItem(2).cast("int").as("pos"),
        col("c").getItem(3).as("tok"),
        col("c").getItem(4).as("bit"))

  /** M6 reader side: reconstruct mention extents + cluster assignment from
    * the coref bits (the reference's gold-standard ingestion path,
    * `ConllDocReader` corefChunks — open/close bracket matching, LIFO per
    * cluster id for nested same-cluster extents). Turns are bounded, so the
    * bracket matching runs per (conv, turn) group.
    * Input: [[parse]] output. Output: (conv_id, turn_idx, start, end,
    * cluster_id). */
  def parseClusters(spark: org.apache.spark.sql.SparkSession,
      parsed: DataFrame): DataFrame = {
    import spark.implicits._
    parsed.select(col("conv_id"), col("turn_idx"), col("pos"), col("bit"))
      .as[(String, Int, Int, String)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (String, Int), it: Iterator[(String, Int, Int, String)]) =>
        val (conv, turn) = key
        val open = scala.collection.mutable.HashMap
          .empty[String, List[Int]].withDefaultValue(Nil)
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int, Int, String)]
        it.toArray.sortBy(_._3).foreach { case (_, _, pos, bit) =>
          if (bit != "-") bit.split("\\|").foreach { part =>
            val opens = part.startsWith("(")
            val closes = part.endsWith(")")
            val id = part.stripPrefix("(").stripSuffix(")")
            if (opens && closes) out += ((conv, turn, pos, pos, id))
            else if (opens) open(id) = pos :: open(id)
            else open(id) match {
              case start :: rest =>
                open(id) = rest
                out += ((conv, turn, start, pos, id))
              case Nil => throw new IllegalStateException(
                s"unmatched close bracket for cluster $id at ($conv, $turn, $pos)")
            }
          }
        }
        val leftover = open.collect { case (id, ps) if ps.nonEmpty => id }
        if (leftover.nonEmpty) throw new IllegalStateException(
          s"unclosed mention brackets for clusters $leftover in ($conv, $turn)")
        out.iterator
      }
      .toDF("conv_id", "turn_idx", "start", "end", "cluster_id")
  }
}
