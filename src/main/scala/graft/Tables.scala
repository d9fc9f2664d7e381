package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Resolver from logical table name to DataFrame over the driver-generated
  * parquet test tables (TESTDATA.md). In production the same resolver shape
  * points at catalog tables / lake paths; everything downstream (ADT
  * translator, pipelines, extension ops) only sees `String => DataFrame`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def resolve(spark: SparkSession, dir: String): String => DataFrame =
    name => spark.read.parquet(s"$dir/$name.parquet")
}
