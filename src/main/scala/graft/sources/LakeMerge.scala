package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions.col

/** Copy-on-write MERGE (upsert by key) into a hive-partitioned parquet lake
  * — the Delta/Hudi CoW primitive on plain files: rewrite ONLY the
  * partitions the batch touches, leave every other partition's files in
  * place.
  *
  * Touched = partitions the batch lands in ∪ partitions holding OLD
  * versions of batch keys. The second set is what makes partition-MOVING
  * updates correct: when a row's partition value changes, its old partition
  * must be rewritten to drop the stale copy — a merge that only rewrites
  * the batch's own partitions leaves a duplicate behind (the classic CoW
  * bug; spec-pinned).
  *
  * Scale shape: the rewrite cost is proportional to the touched partitions'
  * data, not the lake — `kept` is a null-SAFE semi-join on the partition
  * key (null-safe so the `__HIVE_DEFAULT_PARTITION__` rows survive; the
  * touched side stays a broadcastable few-row frame) then an anti-join on
  * the batch keys (batch side small by contract, broadcastable). Nothing
  * about the lake's untouched partitions is read back, rewritten, or
  * shuffled beyond that scan.
  *
  * Crash safety (same stash discipline as
  * [[graft.streaming.DedupIngest.compactStore]]): the merged result is
  * staged to a sibling `<lake>__merge_tmp` dir first; only a COMPLETE stage
  * is then applied to the lake by RENAMING each staged partition directory
  * over its lake counterpart (delete old dir, rename staged dir in — the
  * same whole-directory replacement dynamic partition overwrite performs,
  * minus re-reading and re-writing every staged byte: apply is O(touched
  * partitions) metadata ops, not a second write of the batch). Stage
  * completeness is marked by our own `_graft_commit` file — written AFTER
  * both the staged parquet and the emptied-partitions marker, so a stage
  * can never be replayed with its evacuation list missing (parquet's own
  * `_SUCCESS` lands before the marker and must not define "complete"). A
  * crash anywhere before the commit marker leaves the lake untouched (the
  * uncommitted stage is cleared as debris on the next merge); a crash
  * after it leaves a committed stage behind, and the next [[merge]] (or an
  * explicit [[recover]]) REPLAYS the apply — the rename loop iterates the
  * directories still IN the stage (an already-moved one is gone from it,
  * and its lake copy stays), so replay always converges to the committed
  * merge.
  *
  * Reference anchor: the lake-side analog of the reference's SQL
  * `SaveStrategy::Upsert` (fabrix-sql executor) — same upsert semantics,
  * expressed as partition-scoped file rewrite instead of row DML.
  */
object LakeMerge {

  /** Upsert `batch` into the partitioned lake at `lakeDir` by `keyCols`.
    * Batch rows replace lake rows with equal keys; new keys append. The
    * batch must carry the lake's full schema (including `partitionCols`).
    * Bootstraps the lake (plain partitioned write) when it doesn't exist.
    */
  def merge(spark: SparkSession, lakeDir: String, batch: DataFrame,
            keyCols: Seq[String], partitionCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    require(partitionCols.nonEmpty, "merge targets a partitioned lake")
    require(keyCols.intersect(partitionCols).isEmpty,
      s"key columns $keyCols must be disjoint from partition columns $partitionCols")
    val lake = new Path(lakeDir)
    val fs = lake.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = stagePath(lake)

    // a complete stage from a crashed apply phase must land before anything
    // reads the lake — the lake may hold a half-applied mix
    replayIfStaged(spark, lake)

    if (!hasData(spark, fs, lake)) {
      fs.delete(stage, true)
      batch.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(lakeDir)
      return
    }
    fs.delete(stage, true) // incomplete debris from a crashed staging run

    val base = spark.read.parquet(lakeDir)
    val cols = base.columns.toSeq
    // the batch plan feeds several jobs below (touched-set collect, staged
    // write) — cache it so an expensive batch source evaluates once
    val aligned = batch.select(cols.map(col): _*).persist()
    try {
      val keys = aligned.select(keyCols.map(col): _*).distinct()
      // old homes of updated keys ∪ new homes: the full touched set —
      // COLLECTED once (≤ partition count by the hive-layout contract):
      // the few rows drive the kept-side semi join as a local relation,
      // the evacuation diff as a driver-side set difference against the
      // staged directory listing, and the empty-batch early-out, so the
      // whole merge schedules exactly TWO jobs (touched scan + staged
      // write) instead of isEmpty + stage + except + overwrite
      val touchedRows = base.join(keys, keyCols, "left_semi")
        .select(partitionCols.map(col): _*)
        .union(aligned.select(partitionCols.map(col): _*))
        .distinct().collect()
      if (touchedRows.isEmpty) return // an empty batch touches nothing
      val touched = spark.createDataFrame(
        java.util.Arrays.asList(touchedRows: _*),
        org.apache.spark.sql.types.StructType(
          partitionCols.map(c => base.schema(c))))
      // null-SAFE partition match: a null partition value is in-contract
      // (__HIVE_DEFAULT_PARTITION__), and a null-unsafe equi-join would
      // silently drop the default partition's kept rows from the stage
      val touchedT = touched.toDF(partitionCols.map("__t_" + _): _*)
      val kept = base.join(touchedT,
          partitionCols.map(c => col(c) <=> col("__t_" + c)).reduce(_ && _),
          "left_semi")
        .join(keys, keyCols, "left_anti")
      val merged = kept.unionByName(aligned)

      // stage the touched partitions' new contents, then apply. REBALANCE
      // by the partition key before the write: without it every write task
      // leaves a file in every partition it touches, and because apply now
      // RENAMES staged dirs (no longer re-reads and re-writes them, which
      // incidentally re-compacted), fragmentation would compound across
      // merges and tax every later base scan. The AQE rebalance clusters
      // rows by partition value, splits oversized groups, and coalesces
      // small ones to advisory size — right-sized files at any scale for
      // ONE exchange of the touched partitions' bytes, strictly cheaper
      // than the full second write the old apply paid.
      merged.hint("rebalance", partitionCols.map(col): _*)
        .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(stage.toString)
      // partitions evacuated by partition-moving updates have no rows in
      // the stage, so apply won't rename anything over them — record them
      // in the stage so apply (and any replay) deletes their stale dirs.
      // The diff is driver-side: touched paths minus the stage's actual
      // directory names (the same hive encoding both ways)
      writeEmptied(spark, fs, stage, partitionCols,
        touchedRows.toIndexedSeq, stagedPartitionDirs(fs, stage).toSet)
      // the commit point: only now is the stage complete enough to replay
      fs.create(new Path(stage, CommitMarker), true).close()
      applyStage(spark, fs, lake)
    } finally aligned.unpersist()
  }

  /** Copy-on-write DELETE by key — the right-to-be-forgotten / retention
    * primitive on the same machinery as [[merge]]: every lake row whose
    * `keyCols` tuple appears in `keys` is removed, rewriting ONLY the
    * partitions that held such rows. A partition deleted down to zero
    * rows is evacuated through the same emptied-partitions marker (its
    * directory is dropped, not left as an empty husk), and the stage /
    * commit-marker / replay discipline is identical — a crash leaves the
    * lake either untouched or convergent on replay, never missing a
    * partition it should have kept.
    *
    * Scale shape: the touched set is a semi-join of the lake on the
    * (small, broadcastable) key frame projected to partition values;
    * only touched partitions' rows are read back and anti-joined. A
    * deletion key that matches nothing touches nothing.
    */
  def delete(spark: SparkSession, lakeDir: String, keys0: DataFrame,
             keyCols: Seq[String], partitionCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "delete needs at least one key column")
    require(partitionCols.nonEmpty, "delete targets a partitioned lake")
    val lake = new Path(lakeDir)
    val fs = lake.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = stagePath(lake)
    replayIfStaged(spark, lake)
    if (!hasData(spark, fs, lake)) return // nothing to delete from
    fs.delete(stage, true)
    val base = spark.read.parquet(lakeDir)
    val keys = keys0.select(keyCols.map(col): _*).distinct().persist()
    try {
      // collected once, like merge: drives the kept-side semi join as a
      // local relation, the empty early-out, and the driver-side
      // evacuation diff (a delete can empty EVERY touched partition — the
      // stage then has no data dirs and all touched paths land emptied)
      val touchedRows = base.join(keys, keyCols, "left_semi")
        .select(partitionCols.map(col): _*).distinct().collect()
      if (touchedRows.isEmpty) return
      val touched = spark.createDataFrame(
        java.util.Arrays.asList(touchedRows: _*),
        org.apache.spark.sql.types.StructType(
          partitionCols.map(c => base.schema(c))))
      val touchedT = touched.toDF(partitionCols.map("__t_" + _): _*)
      val kept = base.join(touchedT,
          partitionCols.map(c => col(c) <=> col("__t_" + c)).reduce(_ && _),
          "left_semi")
        .join(keys, keyCols, "left_anti")
      kept.hint("rebalance", partitionCols.map(col): _*)
        .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(stage.toString)
      writeEmptied(spark, fs, stage, partitionCols,
        touchedRows.toIndexedSeq, stagedPartitionDirs(fs, stage).toSet)
      fs.create(new Path(stage, CommitMarker), true).close()
      applyStage(spark, fs, lake)
    } finally keys.unpersist()
  }

  /** Replay a crashed merge's apply phase, if a complete stage exists. Safe
    * (and a no-op) any other time.
    */
  def recover(spark: SparkSession, lakeDir: String): Unit =
    replayIfStaged(spark, new Path(lakeDir))

  // ----------------------------------------------------------- internals --

  private[sources] def stagePath(lake: Path): Path =
    new Path(lake.getParent, lake.getName + "__merge_tmp")

  /** Rename each staged partition directory over its lake counterpart —
    * the whole-directory replacement dynamic partition overwrite performs,
    * without re-reading and re-writing the staged bytes (apply is
    * O(touched partitions) metadata ops, not a second write of the batch)
    * — then drop partition dirs the stage marked emptied, then clear the
    * stage. Only called with a committed (`_graft_commit`-marked) stage;
    * idempotent: a replay iterates the directories still IN the stage (an
    * already-moved one is gone from it, and its lake copy stays), and a
    * crash between a per-directory delete and its rename just re-runs
    * that pair.
    */
  private[sources] def applyStage(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
                                  lake: Path): Unit = {
    val stage = stagePath(lake)
    val staged = stagedPartitionDirs(fs, stage)
    // an unpartitioned stage (data files at the root, no hive dirs) cannot
    // be applied per-partition — refuse rather than drop the batch. A
    // stage with NO data dirs at all (a delete that evacuated every
    // touched partition) is legal: only emptied dirs to drop.
    require(staged.nonEmpty || !hasData(spark, fs, stage),
      s"stage $stage has data files but no hive partition layout")
    staged.foreach { rel =>
      val dest = new Path(lake, rel)
      fs.delete(dest, true)
      val parent = dest.getParent
      if (!fs.exists(parent)) fs.mkdirs(parent)
      if (!fs.rename(new Path(stage, rel), dest))
        throw new java.io.IOException(s"apply: cannot move staged $rel into $lake")
    }
    readEmptied(fs, stage).foreach { rel => fs.delete(new Path(lake, rel), true) }
    fs.delete(stage, true)
  }

  /** The stage's leaf partition directories as relative hive paths
    * (`a=v/b=w`), discovered from the directory layout: walk `name=value`
    * directories down; a hive dir with no hive subdirs is a leaf.
    */
  private[sources] def stagedPartitionDirs(fs: org.apache.hadoop.fs.FileSystem,
                                           stage: Path): Seq[String] = {
    if (!fs.exists(stage)) return Nil
    def walk(p: Path, rel: List[String]): Seq[String] = {
      val subs = fs.listStatus(p)
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      if (subs.isEmpty) {
        if (rel.isEmpty) Nil else Seq(rel.reverse.mkString("/"))
      } else subs.toSeq.flatMap(st => walk(st.getPath, st.getPath.getName :: rel))
    }
    walk(stage, Nil)
  }

  private val EmptiedMarker = "_graft_emptied_partitions"
  private[sources] val CommitMarker = "_graft_commit"

  /** Record evacuated partitions as relative dir paths, one per line, in a
    * marker file INSIDE the stage — written before apply starts, so a
    * replayed apply deletes them too. Evacuated = touched partitions the
    * stage did not reproduce as a directory: the touched rows are encoded
    * with the same hive path encoding Spark's writer uses, so the diff is
    * a driver-side string set difference (no Spark job).
    */
  private[sources] def writeEmptied(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
                                    stage: Path, partitionCols: Seq[String],
                                    touchedRows: Seq[org.apache.spark.sql.Row],
                                    stagedDirs: Set[String]): Unit = {
    val lines = touchedRows.map { r =>
      partitionCols.zipWithIndex.map { case (c, i) =>
        ExternalCatalogUtils.getPartitionPathString(c,
          if (r.isNullAt(i)) null else r.get(i).toString)
      }.mkString("/")
    }.filterNot(stagedDirs.contains)
    writeEmptiedLines(fs, stage, lines)
  }

  /** Raw-relative-path form of the emptied marker — for callers that know
    * the exact directory names to evacuate (e.g. compaction's
    * non-canonical alias dirs), bypassing value re-encoding.
    */
  private[sources] def writeEmptiedLines(fs: org.apache.hadoop.fs.FileSystem,
                                         stage: Path, lines: Seq[String]): Unit = {
    val out = fs.create(new Path(stage, EmptiedMarker), true)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
  }

  private def readEmptied(fs: org.apache.hadoop.fs.FileSystem, stage: Path): Seq[String] = {
    val p = new Path(stage, EmptiedMarker)
    if (!fs.exists(p)) return Nil
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** A stage with the `_graft_commit` marker is a committed merge whose
    * apply may not have finished — replay it. A stage without one is debris
    * from a crash mid-staging (even if the staged parquet's own `_SUCCESS`
    * landed, the evacuation list may be missing): the lake was never
    * touched, so just drop it.
    */
  private[sources] def replayIfStaged(spark: SparkSession, lake: Path): Unit = {
    val fs = lake.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = stagePath(lake)
    if (!fs.exists(stage)) return
    if (fs.exists(new Path(stage, CommitMarker))) applyStage(spark, fs, lake)
    else fs.delete(stage, true)
  }

  /** Data-file presence check (debris-only dirs count as absent), same
    * contract as the ingest stores'.
    */
  private[sources] def hasData(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
                               dir: Path): Boolean =
    fs.exists(dir) && {
      def any(p: Path): Boolean = fs.listStatus(p).exists { st =>
        val n = st.getPath.getName
        if (st.isDirectory) !n.startsWith("_") && !n.startsWith(".") && any(st.getPath)
        else !n.startsWith("_") && !n.startsWith(".")
      }
      any(dir)
    }
}
