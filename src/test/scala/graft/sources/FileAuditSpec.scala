package graft.sources

import graft.SparkSpec

class FileAuditSpec extends SparkSpec {
  import spark.implicits._

  test("rowsPerFile attributes rows to physical files; summary collapses the layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_file_audit").toString
    spark.range(90).toDF("id").repartition(3).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val per = FileAudit.rowsPerFile(back).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(per.length == 3)
    assert(per.map(_._2).sum == 90L)
    assert(per.forall(_._1.endsWith(".parquet")), per.map(_._1).mkString(","))
    assert(per.forall(!_._1.contains("/")))
    val s = FileAudit.summary(back).head()
    assert(s.getLong(0) == 3L && s.getLong(1) == 90L)
    assert(s.getLong(2) <= s.getLong(4) && s.getLong(4) <= s.getLong(3))
  }

  test("partitionBy layout: one file per partition value, counts match the group sizes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_file_audit_p").toString
    Seq((1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "b"))
      .toDF("id", "k").coalesce(1)
      .write.mode("overwrite").partitionBy("k").parquet(dir)
    val s = FileAudit.summary(spark.read.parquet(dir)).head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3), s.getLong(4)) ==
      ((2L, 5L, 2L, 3L, 2L)))
  }
}
