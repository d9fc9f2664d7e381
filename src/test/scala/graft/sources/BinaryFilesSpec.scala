package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Opaque-file ingest: byte fidelity, glob filtering, recursion, and
  * metadata-only projection pruning the content column from the scan.
  */
class BinaryFilesSpec extends SparkSpec {

  import spark.implicits._

  private def mkCorpus(): String = {
    val dir = Files.createTempDirectory("binfiles").toString
    Files.write(Paths.get(dir, "a.png"), Array[Byte](0x42, 0x00, 0x7f, -1))
    Files.write(Paths.get(dir, "b.wav"), "RIFFdata".getBytes("UTF-8"))
    Files.createDirectory(Paths.get(dir, "sub"))
    Files.write(Paths.get(dir, "sub", "c.png"), Array[Byte](1, 2, 3))
    dir
  }

  test("reads every file with exact bytes and sizes") {
    val dir = mkCorpus()
    val rows = BinaryFiles.read(spark, dir)
      .select("file_name", "n_bytes", "content")
      .as[(String, Long, Array[Byte])].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq("a.png", "b.wav"))
    assert(rows(0)._2 === 4L && rows(0)._3.toSeq === Seq[Byte](0x42, 0x00, 0x7f, -1))
    assert(rows(1)._3.toSeq === "RIFFdata".getBytes("UTF-8").toSeq)
  }

  test("glob filter restricts by pattern; recursion picks up subdirs") {
    val dir = mkCorpus()
    val flat = BinaryFiles.read(spark, dir, glob = Some("*.png"))
      .select("file_name").as[String].collect().toSet
    assert(flat === Set("a.png"))
    val rec = BinaryFiles.read(spark, dir, glob = Some("*.png"), recursive = true)
      .select("file_name").as[String].collect().toSet
    assert(rec === Set("a.png", "c.png"))
  }

  test("metadata-only projection prunes content from the scan schema") {
    val dir = mkCorpus()
    val plan = BinaryFiles.read(spark, dir).select("file_name", "n_bytes")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("content#") || !plan.contains("ReadSchema: struct[^]]*content"),
      "content column should be pruned when only metadata is selected")
  }
}
