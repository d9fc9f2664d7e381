package graft.sources

import graft.core.Fabrix
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** Path-backed table store with the reference's write-conflict semantics
  * (SaveStrategy, fabrix-sql/src/executor/ec.rs:476-540): the lake-table
  * stand-in for the reference's DB tables when no external DB is reachable.
  *
  * Replace is transactional the way the reference's drop+create+insert is
  * (ec.rs:602-651): write to a staging dir, then swap via atomic rename, so
  * readers never observe a half-written table and a failed job leaves the
  * old data intact.
  *
  * Upsert follows the reference's split-on-existing-ids plan (ec.rs:518-538)
  * re-expressed distributed: anti-join the EXISTING rows against incoming
  * ids (keep unmatched old rows), union incoming (new + updated), swap.
  * One shuffle on the index column; Spark broadcasts the small side
  * automatically.
  */
final class ParquetStore(root: String) {

  private def tablePath(name: String): Path = Paths.get(root, s"$name.parquet")

  def exists(name: String): Boolean = Files.exists(tablePath(name))

  def listTables(): Seq[String] =
    Option(Paths.get(root).toFile.list()).map(_.toSeq).getOrElse(Nil)
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet")).sorted

  def read(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(tablePath(name).toString)

  /** DDL-ish surface (reference S14): drop / truncate / rename. */
  def drop(name: String): Unit = deleteRecursively(tablePath(name))

  def rename(oldName: String, newName: String): Unit =
    Files.move(tablePath(oldName), tablePath(newName), StandardCopyOption.ATOMIC_MOVE)

  def truncate(spark: SparkSession, name: String): Unit = {
    val schema = read(spark, name).schema
    write(spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema),
      name, SaveStrategy.Replace)
  }

  def write(df: DataFrame, name: String, strategy: SaveStrategy): Unit = strategy match {
    case SaveStrategy.FailIfExists =>
      if (exists(name)) throw new IllegalStateException(s"table $name already exists")
      replaceWith(df, name)

    case SaveStrategy.Replace =>
      replaceWith(df, name)

    case SaveStrategy.Append =>
      if (!exists(name)) replaceWith(df, name)
      else df.write.mode("append").parquet(tablePath(name).toString)

    case SaveStrategy.Upsert(indexCol) =>
      if (!exists(name)) replaceWith(df, name)
      else {
        val spark = df.sparkSession
        val existing = Fabrix(read(spark, name), indexCol)
        val incoming = Fabrix(df, indexCol)
        val (_, keep) = existing.popupRowsByFrame(incoming) // anti: not being updated
        replaceWith(keep.df.unionByName(df), name)
      }
  }

  /** Staged write + atomic swap. */
  private def replaceWith(df: DataFrame, name: String): Unit = {
    val target = tablePath(name)
    val staging = Paths.get(root, s".$name.staging.parquet")
    deleteRecursively(staging)
    df.write.mode("overwrite").parquet(staging.toString)
    val backup = Paths.get(root, s".$name.old.parquet")
    deleteRecursively(backup)
    if (Files.exists(target)) Files.move(target, backup, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
    catch { case e: Throwable =>
      if (Files.exists(backup)) Files.move(backup, target, StandardCopyOption.ATOMIC_MOVE)
      throw e
    }
    deleteRecursively(backup)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
