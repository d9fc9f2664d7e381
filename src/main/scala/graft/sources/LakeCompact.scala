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
  * Candidate rows are read PER DIRECTORY (with `basePath` so partition
  * values resolve), not by value filter — so a lake written externally
  * with non-canonical directory names (`p=01` aliasing `p=1` under a
  * numeric partition column) compacts correctly: the rows land under the
  * canonical directory and every candidate directory the stage did not
  * reproduce by name is evacuated through the emptied-partitions marker
  * (alias husks are dropped, never double-counted). When a staged
  * canonical name collides with an existing lake directory that was NOT
  * in the candidate set (alias `p=01` fragmented, canonical `p=1` a
  * single healthy file), the colliding directory is pulled into the read
  * set and the stage is rebuilt — dynamic partition overwrite replaces
  * whole directories, so overwriting a never-read directory would delete
  * its rows. Canonical names are a fixpoint of the stage write, so the
  * expansion converges in one extra pass; a pulled-in directory may push
  * the rewrite past `targetBytes`, which is accepted (correctness over
  * the size heuristic).
  *
  * Scale shape: the candidate scan is a driver-side directory listing
  * (bounded by the lake's partition/file COUNT, not its bytes — the
  * hive-layout contract that partitions are few); the rewrite reads only
  * qualifying directories and shuffles them once (`repartition` on the
  * partition key) so each compacted partition lands as one file.
  */
object LakeCompact {

  /** One row per fragmented partition: (partition_dir, n_files,
    * total_bytes). Driver-side listing, partition-count-sized.
    */
  def fragmented(spark: SparkSession, lakeDir: String,
                 partitionCols: Seq[String], targetBytes: Long): DataFrame = {
    import spark.implicits._
    val rows = listPartitions(spark, lakeDir, partitionCols)
      .filter { case (_, n, bytes) => n > 1 && bytes <= targetBytes }
      .map { case (rel, n, bytes) => (stripValues(rel), n, bytes) }
    rows.toDF("partition_values", "n_files", "total_bytes")
  }

  /** Compact every qualifying partition to a single file. Returns the
    * number of partition directories rewritten (0 = nothing fragmented;
    * the lake is untouched).
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

    val allParts = listPartitions(spark, lakeDir, partitionCols)
    val allRel = allParts.map(_._1).toSet
    val candidates = allParts
      .filter { case (_, n, bytes) => n > 1 && bytes <= targetBytes }
    if (candidates.isEmpty) return 0

    // read the candidate DIRECTORIES (not a value filter): exactly their
    // rows, once each, with partition values resolved via basePath. If
    // the stage produces a canonical name that collides with a lake dir
    // we did NOT read (alias candidate + healthy canonical sibling),
    // pull that dir in and restage — apply would otherwise overwrite it
    // with only the alias's rows. Staged names are already canonical, so
    // re-reading canonical dirs adds no new names: ≤1 extra pass.
    var readSet = candidates.map(_._1).toSet
    var stagedRel = Set.empty[String]
    var stable = false
    var passes = 0
    while (!stable) {
      passes += 1
      require(passes <= 4, s"compaction stage did not converge after $passes passes")
      fs.delete(stage, true)
      val dirs = readSet.toSeq.sorted
      val selected = spark.read.option("basePath", lakeDir)
        .parquet(dirs.map(rel => s"$lakeDir/$rel"): _*)
        // one task per partition value -> one file per compacted partition
        .repartition(dirs.length, partitionCols.map(col): _*)
      selected.write.mode("overwrite")
        .partitionBy(partitionCols: _*).parquet(stage.toString)
      stagedRel = listPartitions(spark, stage.toString, partitionCols)
        .map(_._1).toSet
      val collisions = (stagedRel -- readSet).intersect(allRel)
      if (collisions.isEmpty) stable = true else readSet ++= collisions
    }
    // any read dir the stage did not reproduce BY NAME is a
    // non-canonical alias whose rows now live under the canonical dir —
    // evacuate the husk, or its rows would exist twice
    val husks = readSet.filterNot(stagedRel.contains).toSeq.sorted
    LakeMerge.writeEmptiedLines(fs, stage, husks)
    fs.create(new Path(stage, LakeMerge.CommitMarker), true).close()
    LakeMerge.applyStage(spark, fs, lake)
    readSet.size
  }

  /** (relative hive dir path `a=v/b=w`, data-file count, total data
    * bytes) per leaf partition directory.
    */
  private def listPartitions(spark: SparkSession, dir: String,
                             partitionCols: Seq[String]): Seq[(String, Long, Long)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    def walk(p: Path, rel: List[String], depth: Int): Seq[(String, Long, Long)] =
      if (depth == partitionCols.length) {
        val files = fs.listStatus(p).filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        if (files.isEmpty) Nil
        else Seq((rel.reverse.mkString("/"), files.length.toLong, files.map(_.getLen).sum))
      } else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .flatMap(st => walk(st.getPath, st.getPath.getName :: rel, depth + 1))
    walk(root, Nil, 0)
  }

  /** `a=v/b=w` → `v/w` (the report's human-readable partition id). */
  private def stripValues(rel: String): String =
    rel.split('/').map(_.dropWhile(_ != '=').drop(1)).mkString("/")
}
