package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S7: wiki standoff annotation sink/source — the reference round-trips its
  * linking output as per-document standoff chunk annotations
  * (`/root/reference/.../wiki/WikiAnnotReaderWriter.scala:1-130`: one line
  * per annotated extent, doc-keyed). Here: tab-separated
  * `conv_id  turn_idx  start  end  title` lines, bucketed by conversation
  * (a conversation never splits across files), [[parse]] inverting the
  * format — so a linking run can be persisted and re-joined to mentions
  * without recomputation. NIL mentions are simply absent, like the
  * reference's `-NIL-` rows being skipped on write. */
object WikiStandoff {

  /** Render standoff lines from mention extents + their links
    * `(mention_id, title)`. */
  def formatLines(mentions: DataFrame, links: DataFrame): DataFrame =
    mentions.select(col("mention_id"), col("conv_id"), col("turn_idx"),
        col("start"), col("end"))
      .join(links.select(col("mention_id"), col("title")), "mention_id")
      .withColumn("line", concat_ws("\t",
        col("conv_id"), col("turn_idx"), col("start"), col("end"), col("title")))

  /** Write lines partitioned by conversation bucket (same sink discipline as
    * [[ConllWriter.write]]). */
  def write(lines: DataFrame, path: String, buckets: Int = 16): Unit =
    lines
      .withColumn("bucket", pmod(xxhash64(col("conv_id")), lit(buckets)))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"), col("start"))
      .select(col("line"))
      .write.mode("overwrite").text(path)

  /** Parse written lines back to `(conv_id, turn_idx, start, end, title)`. */
  def parse(lines: DataFrame): DataFrame =
    lines.select(split(col("value"), "\t").as("c"))
      .select(col("c").getItem(0).as("conv_id"),
        col("c").getItem(1).cast("int").as("turn_idx"),
        col("c").getItem(2).cast("int").as("start"),
        col("c").getItem(3).cast("int").as("end"),
        col("c").getItem(4).as("title"))
}
