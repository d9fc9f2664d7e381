package graft.sources

import graft.SparkSpec
import graft.core.Fabrix
import graft.xl.{ExcelValue, XlIngest, XlsxReader, XlsxWriter}
import java.nio.file.Files

/** Round-3 extension-surface coverage: DynConn registry (S15), series search
  * (F9), custom row decoder (X4), XL per-cell transform + index selection
  * (X1 / S7 rest).
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("DynConn: add/get/update/remove lifecycle, duplicate add fails") {
    val reg = DynConn.sql()
    val k = DynConn.newKey()
    val ex = new JdbcExecutor("jdbc:derby:memory:dynconn;create=true")
    reg.add(k, ex)
    assert(reg.contains(k) && reg.get(k).contains(ex) && reg.keys == Seq(k))
    intercept[IllegalStateException](reg.add(k, ex))
    assert(reg.update(k, ex).contains(ex))
    assert(reg.remove(k).contains(ex) && reg.size == 0)
    intercept[NoSuchElementException](reg.require(k))
  }

  test("series search: contains / findIndex / findIndices by dense position") {
    val f = Fabrix(Seq("a", "b", "c", "b", null).toDF("s"))
    assert(f.seriesContains("s", "b") && !f.seriesContains("s", "z"))
    assert(f.seriesContains("s", null)) // null-safe equality
    assert(f.findIndex("s", "b").contains(1L))
    assert(f.findIndex("s", "z").isEmpty)
    assert(f.findIndices("s", Seq("b", "c")) == Seq(1L, 2L, 3L))
  }

  test("fetchAllCustom decodes rows with a caller-supplied mapper") {
    val ex = new JdbcExecutor("jdbc:derby:memory:cstdec;create=true")
    ex.write(Seq((1L, "x"), (2L, "y")).toDF("id", "s"), "t", SaveStrategy.Replace)
    val got = ex.fetchAllCustom("SELECT \"id\", \"s\" FROM \"t\" ORDER BY \"id\"") { rs =>
      s"${rs.getLong(1)}:${rs.getString(2)}"
    }
    assert(got == Vector("1:x", "2:y"))
  }

  test("read-side type map: introspected schema as Spark StructType (X5)") {
    import org.apache.spark.sql.types._
    val ex = new JdbcExecutor("jdbc:derby:memory:typemap;create=true")
    ex.createTable("tm", StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType), StructField("d", DecimalType(10, 2)),
      StructField("e", DateType))))
    val sch = ex.tableSchemaSpark("tm")
    assert(sch.fields.map(_.dataType).toSeq ==
      Seq(LongType, StringType, DoubleType, DecimalType(10, 2), DateType))
  }

  test("XL ingest: per-cell transform hook and index selection") {
    val path = Files.createTempDirectory("graft-xlext").resolve("t.xlsx").toString
    XlsxWriter.write(path,
      header = Some(Seq("id", "name")),
      rows = Iterator(Seq(1, "alpha"), Seq(2, "beta")))
    val reader = new XlsxReader(path)
    var got: Option[Fabrix] = None
    val n = XlIngest.runFx(spark, reader, "data", SaveStrategy.Replace,
      sink = (fx, _) => got = Some(fx),
      transformCell = {
        case ExcelValue.Str(s) => ExcelValue.Str(s.toUpperCase) // X1 hook
        case other             => other
      },
      index = Some(XlIngest.XlIndex.ByPos(0)))
    reader.close()
    assert(n == 2)
    val fx = got.get
    // header cells went through the transform too
    assert(fx.df.columns.toSeq == Seq("ID", "NAME"))
    assert(fx.indexTag.map(_.name).contains("ID"))
    assert(fx.df.select("NAME").as[String].collect().sorted.toSeq == Seq("ALPHA", "BETA"))
  }
}
