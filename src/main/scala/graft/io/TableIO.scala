package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** Snapshot-committing table seam (SURVEY.md §7.0).
  *
  * The north rule names Iceberg; no Iceberg runtime exists in this sandbox
  * (`/opt/spark/jars`, offline coursier), so this seam provides the Iceberg
  * properties the pipeline actually relies on — atomic snapshot commit,
  * resume-by-snapshot, per-partition counters + lineage in a manifest — over
  * Parquet + a JSON commit log. A real Iceberg catalog binding drops in behind
  * the same four methods when the runtime jar is on the spark-submit
  * classpath.
  *
  * Layout: `<root>/<stage>/snap-<k>/` (parquet) + `<root>/<stage>/snap-<k>.json`
  * (manifest; the commit marker — data without a manifest is an uncommitted
  * torn write and is ignored). Manifest records the input lineage token, row
  * count, and per-partition row counters (north rule: "resume from any
  * per-partition checkpoint with lineage + counters persisted per partition").
  */
class TableIO(rootDir: String) {
  private def stageDir(stage: String): Path = Paths.get(rootDir, stage)

  /** Latest committed snapshot id of a stage, if any. */
  def latestSnapshot(stage: String): Option[Int] = {
    val d = stageDir(stage)
    if (!Files.isDirectory(d)) None
    else {
      val snaps = Files.list(d).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("snap-") && s.endsWith(".json") =>
          s.stripPrefix("snap-").stripSuffix(".json").toInt }
        .toSeq
      if (snaps.isEmpty) None else Some(snaps.max)
    }
  }

  def manifest(stage: String, snap: Int): Option[String] = {
    val p = stageDir(stage).resolve(s"snap-$snap.json")
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  /** Atomic-commit write: parquet data first, manifest (the commit marker)
    * last. `lineage` is a deterministic token of the inputs (e.g. upstream
    * stage+snapshot ids + config hash) enabling resume-safety checks. */
  def commit(stage: String, df: DataFrame, lineage: String): Int = {
    val snap = latestSnapshot(stage).map(_ + 1).getOrElse(0)
    val dataPath = stageDir(stage).resolve(s"snap-$snap").toString
    df.write.mode("overwrite").parquet(dataPath)
    // per-partition counters tied to the COMMITTED FILES (not read-time scan
    // splits, which shift with split sizing): one scan computes both the
    // per-file counters and the total row count
    val spark = df.sparkSession
    val stats = spark.read.parquet(dataPath)
      .groupBy(input_file_name().as("file")).agg(count(lit(1)).as("rows"))
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1)))
      .sortBy(_._1)
    val counters = stats
      .map { case (f, n) => s"""{"file":"$f","rows":$n}""" }
      .mkString("[", ",", "]")
    val rowCount = stats.map(_._2).sum
    val m =
      s"""{"stage":"${stage}","snapshot":$snap,"lineage":"${lineage}",
         |"rowCount":$rowCount,"partitionCounters":$counters}""".stripMargin.replace("\n", "")
    Files.createDirectories(stageDir(stage))
    val tmp = stageDir(stage).resolve(s".snap-$snap.json.tmp")
    Files.writeString(tmp, m)
    Files.move(tmp, stageDir(stage).resolve(s"snap-$snap.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    snap
  }

  private val LineageRe = """"lineage":"([^"]*)"""".r
  private val RowCountRe = """"rowCount":(\d+)""".r

  /** Read a committed snapshot (latest when `snap` is None); None when the
    * stage has no committed snapshot, the lineage token does not match, or
    * the snapshot's data no longer agrees with its manifest row count — the
    * caller then recomputes (resume semantics).
    *
    * Lineage is compared as the PARSED manifest field (exact equality), not
    * a substring scan — a token that is a prefix of another can never
    * false-match. The row-count check makes a torn / tampered snapshot
    * (e.g. a lost part file under a surviving manifest) fail loudly into a
    * recompute instead of a silent short read; it is a parquet-footer-only
    * count, cheap relative to any recompute it guards. */
  def readIfCurrent(spark: SparkSession, stage: String, lineage: String,
      snap: Option[Int] = None): Option[DataFrame] = {
    val s = snap.orElse(latestSnapshot(stage))
    s.flatMap { k =>
      manifest(stage, k) match {
        case Some(m) if LineageRe.findFirstMatchIn(m).exists(_.group(1) == lineage) =>
          val expected = RowCountRe.findFirstMatchIn(m).map(_.group(1).toLong)
          try {
            val df = spark.read.parquet(stageDir(stage).resolve(s"snap-$k").toString)
            if (expected.forall(_ == df.count())) Some(df) else None
          } catch { case _: Exception => None } // unreadable data = torn write
        case _ => None
      }
    }
  }
}
