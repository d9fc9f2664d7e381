package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque-file ingest — the on-ramp from "a bucket of image/audio/doc
  * files" to the multimodal column model ([[graft.llm.Multimodal]] sniff/
  * decode run on the `content` column this source produces). Wraps Spark's
  * `binaryFile` source: one row per file with (`path`, `mod_time`,
  * `n_bytes`, `content`), read partition-parallel — each file is one scan
  * split, so a 10⁸-file corpus fans out across executors with no driver
  * listing bottleneck beyond the initial file index.
  *
  * Scale notes:
  *  - files are NOT splittable here (a row = a whole file) — this source
  *    is for payload corpora (images, audio clips, PDFs), not for giant
  *    single files; `spark.sql.files.maxPartitionBytes` governs how many
  *    small files coalesce into one task (small-file pressure shows up as
  *    task-count, not memory);
  *  - `content` loads the whole file into one row — cap payload size
  *    upstream of any shuffle, or project metadata-only columns first
  *    (dropping `content` before an exchange prunes it from the scan:
  *    columnar pruning applies to this source like any other).
  */
object BinaryFiles {

  /** Read every file under `dir` (optionally matching `glob`, e.g.
    * `*.png`; optionally recursing into subdirectories) as
    * (path, file_name, mod_time, n_bytes, content).
    */
  def read(spark: SparkSession, dir: String, glob: Option[String] = None,
           recursive: Boolean = false): DataFrame = {
    val base = spark.read.format("binaryFile")
    val withGlob = glob.fold(base)(g => base.option("pathGlobFilter", g))
    withGlob
      .option("recursiveFileLookup", recursive.toString)
      .load(dir)
      .select(
        col("path"),
        regexp_extract(col("path"), "[^/]+$", 0).as("file_name"),
        col("modificationTime").as("mod_time"),
        col("length").as("n_bytes"),
        col("content"))
  }
}
