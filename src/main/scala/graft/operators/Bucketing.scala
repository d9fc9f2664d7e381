package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins and pre-partitioned
  * aggregation — the "shuffle once at write time, never again at read time"
  * pattern that matters most at the 100 TB end: a fact table bucketed on its
  * join key turns every subsequent equi-join against a same-bucketed table
  * (and every groupBy on the key) into a zero-exchange plan.
  *
  * This is plain Spark bucketing (`bucketBy`/`sortBy` + `saveAsTable`);
  * the helper exists so pipelines declare layout intent in one call and so
  * the contract — same bucket count + same key on both sides, catalog table
  * reads (path reads don't carry bucket metadata) — is written down once.
  *
  * `sortBy` the same key too: sorted buckets let SortMergeJoin skip its
  * per-partition sort, and give min/max file skipping on the key.
  */
object Bucketing {

  /** Write `df` as a bucketed catalog table (parquet under the warehouse).
    * Overwrites any existing table of the same name.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String], nBuckets: Int,
                    sortCols: Seq[String] = Nil, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketBy needs at least one column")
    val sorts = if (sortCols.nonEmpty) sortCols else bucketCols
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a bucketed table back WITH its bucket metadata (a path read of the
    * same files would lose it and re-shuffle on join).
    */
  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
