package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction for a hive-partitioned parquet lake — the
  * maintenance pass every CoW lake needs: continuous [[LakeMerge]] /
  * streaming ingest leaves partitions fragmented into many small files,
  * and small files tax every subsequent scan (task-per-file scheduling,
  * footer reads, no intra-file parallelism to lose anyway). Compaction
  * rewrites ONLY fragmented partitions — a partition qualifies when it
  * holds more than one data file AND its total bytes fit under
  * `targetBytes` (so the rewrite yields one right-sized file; partitions
  * already larger than the target are a splitting problem, not a
  * small-file problem, and are left alone). Row content is bit-identical
  * before and after — compaction is a physical re-layout, never a
  * semantic operation (the gate hashes content identity).
  *
  * Crash safety: the rewritten partitions go through [[LakeMerge]]'s
  * stage + `_graft_commit` + dynamic-partition-overwrite apply — a crash
  * leaves the lake untouched or the apply replays idempotently, never a
  * torn partition. Compaction and merge share one stage path, so their
  * recovery disciplines compose (run [[LakeMerge.recover]] either way).
  *
  * Scale shape: the candidate scan is a driver-side directory listing
  * (bounded by the lake's partition/file COUNT, not its bytes — the
  * hive-layout contract that partitions are few); the rewrite reads only
  * qualifying partitions (partition-pruned semi-join on literal values)
  * and shuffles them once (`repartition` on the partition key) so each
  * compacted partition lands as one file.
  */
object LakeCompact {

  /** One row per fragmented partition: (partitionCols*, n_files,
    * total_bytes). Driver-side listing, partition-count-sized.
    */
  def fragmented(spark: SparkSession, lakeDir: String,
                 partitionCols: Seq[String], targetBytes: Long): DataFrame = {
    import spark.implicits._
    val rows = listPartitions(spark, lakeDir, partitionCols)
      .filter { case (_, n, bytes) => n > 1 && bytes <= targetBytes }
      .map { case (vals, n, bytes) => (vals.mkString("/"), n, bytes) }
    rows.toDF("partition_values", "n_files", "total_bytes")
  }

  /** Compact every qualifying partition to a single file. Returns the
    * number of partitions rewritten (0 = nothing fragmented; the lake is
    * untouched).
    */
  def compact(spark: SparkSession, lakeDir: String,
              partitionCols: Seq[String], targetBytes: Long): Int = {
    require(partitionCols.nonEmpty, "compaction targets a partitioned lake")
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val lake = new Path(lakeDir)
    val fs = lake.getFileSystem(spark.sparkContext.hadoopConfiguration)
    LakeMerge.replayIfStaged(spark, lake)
    if (!LakeMerge.hasData(spark, fs, lake)) return 0
    val stage = LakeMerge.stagePath(lake)
    fs.delete(stage, true)

    val candidates = listPartitions(spark, lakeDir, partitionCols)
      .filter { case (_, n, bytes) => n > 1 && bytes <= targetBytes }
    if (candidates.isEmpty) return 0

    val base = spark.read.parquet(lakeDir)
    // partition-pruned selection: literal IN-list over the (few) candidate
    // partition value tuples — the scan touches only their directories
    val cond = candidates.map { case (vals, _, _) =>
      partitionCols.zip(vals).map { case (c, v) =>
        if (v == null) col(c).isNull else col(c) <=> org.apache.spark.sql.functions.lit(v)
      }.reduce(_ && _)
    }.reduce(_ || _)
    val selected = base.where(cond)
      // one task per partition value -> one file per compacted partition
      .repartition(candidates.length, partitionCols.map(col): _*)
    selected.write.mode("overwrite")
      .partitionBy(partitionCols: _*).parquet(stage.toString)
    // compaction never empties a partition
    LakeMerge.writeEmptied(spark, fs, stage, partitionCols, base.limit(0)
      .select(partitionCols.map(col): _*))
    fs.create(new Path(stage, LakeMerge.CommitMarker), true).close()
    LakeMerge.applyStage(spark, fs, lake)
    candidates.length
  }

  /** (partition values in `partitionCols` order, data-file count, total
    * data bytes) per leaf partition directory. Values are the RAW hive
    * directory strings (URL-decoded); `null` for the default partition.
    */
  private def listPartitions(spark: SparkSession, lakeDir: String,
                             partitionCols: Seq[String]): Seq[(Seq[String], Long, Long)] = {
    val lake = new Path(lakeDir)
    val fs = lake.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(lake)) return Nil
    def walk(p: Path, vals: List[String], depth: Int): Seq[(Seq[String], Long, Long)] =
      if (depth == partitionCols.length) {
        val files = fs.listStatus(p).filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        if (files.isEmpty) Nil
        else Seq((vals.reverse, files.length.toLong, files.map(_.getLen).sum))
      } else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .flatMap { st =>
          val raw = st.getPath.getName.dropWhile(_ != '=').drop(1)
          val dec = java.net.URLDecoder.decode(raw, "UTF-8")
          val v = if (dec == "__HIVE_DEFAULT_PARTITION__") null else dec
          walk(st.getPath, v :: vals, depth + 1)
        }
    walk(lake, Nil, 0)
  }
}
