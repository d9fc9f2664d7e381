package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dispatcher-equivalent ETL composition (fabrix/src/dispatcher/ds.rs:72-176:
  * reader → optional transform → writer), built Spark-first: the reference
  * eagerly materializes an in-memory buffer between read and write
  * (ds.rs:153-175); here every stage stays a lazy plan on ONE DataFrame so
  * Catalyst fuses read, transforms and write into a single job — filters
  * reach the scan, projections prune columns, nothing materializes on the
  * driver at any scale.
  */
final case class Pipeline(
    reader: SparkSession => DataFrame,
    transforms: Vector[DataFrame => DataFrame] = Vector.empty) {

  /** Add a transform stage (dispatcher_tests.rs:136-153 transform hook). */
  def transform(f: DataFrame => DataFrame): Pipeline = copy(transforms = transforms :+ f)

  /** The composed (still-lazy) frame. */
  def frame(spark: SparkSession): DataFrame =
    transforms.foldLeft(reader(spark))((df, f) => f(df))

  /** Run end-to-end into a sink. */
  def write(spark: SparkSession)(writer: DataFrame => Unit): Unit =
    writer(frame(spark))
}

object Pipeline {
  import graft.sources._

  def fromCsv(path: String, opts: CsvReadOptions = CsvReadOptions()): Pipeline =
    Pipeline(s => Csv.read(s, path, opts))
  def fromParquet(path: String, opts: ParquetReadOptions = ParquetReadOptions()): Pipeline =
    Pipeline(s => Parquet.read(s, path, opts))
  def fromJson(path: String, opts: JsonReadOptions = JsonReadOptions()): Pipeline =
    Pipeline(s => Json.read(s, path, opts))
  def fromDataFrame(df: DataFrame): Pipeline = Pipeline(_ => df)
}
