package graft.wire

import graft.SparkSpec
import graft.core.Fabrix
import graft.sources.{JsonDirStore, SavingCategory}
import graft.wire.JsonWire.WireType
import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Wire parity: golden strings from the reference tests
  * (fabrix-json/src/ec.rs:150,182,217,252). The per-value-scale Decimal
  * column of the reference (Polars Object column of rust_decimal) cannot
  * exist in Spark (one scale per DecimalType column) — decimal parity is
  * asserted by roundtrip with uniform scale; everything else byte-exact.
  */
class JsonWireSpec extends SparkSpec {
  import spark.implicits._

  private def simpleFx: Fabrix = {
    val schema = StructType(Seq(
      StructField("names", StringType),
      StructField("ord", IntegerType),
      StructField("val", IntegerType)))
    val rows = java.util.Arrays.asList(
      Row("Jacob", 1, Integer.valueOf(10)),
      Row("Sam", 2, null),
      Row("Jason", 3, Integer.valueOf(8)))
    Fabrix(spark.createDataFrame(rows, schema))
  }

  // fabrix-json/src/ec.rs:150 golden string, verbatim
  private val goldenColumn =
    """{"data":[{"name":"names","datatype":"String","values":["Jacob","Sam","Jason"]},{"name":"ord","datatype":"I32","values":[1,2,3]},{"name":"val","datatype":"I32","values":[10,null,8]}],"index_tag":null}"""

  test("column-wise golden parity (ec.rs:150)") {
    assert(JsonWire.toJson(simpleFx, WireType.Column) == goldenColumn)
  }

  test("column-wise golden roundtrip") {
    val fx = JsonWire.fromJson(spark, goldenColumn, WireType.Column)
    assert(JsonWire.toJson(fx, WireType.Column) == goldenColumn)
    assert(fx.df.schema.map(_.name) == Seq("names", "ord", "val"))
    assert(fx.df.count() == 3)
  }

  private def typedFx: Fabrix = {
    val meta = (k: String) => new MetadataBuilder().putString(JsonWire.MetaKey, k).build()
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("date", DateType),
      StructField("time", LongType, nullable = true, meta("time")),
      StructField("datetime", TimestampNTZType),
      StructField("uuid", StringType, nullable = true, meta("uuid")),
      StructField("bytes", BinaryType)))
    def ldt(s: Int) = java.time.LocalDateTime.of(2020, 1, 1, 12, 0, s)
    val rows = java.util.Arrays.asList(
      Row(1, "a", java.time.LocalDate.of(2020, 1, 1), 43200000000000L, ldt(0),
        "72b1e846-1f57-47da-bae0-9c08b0ba0fce", "Jacob".getBytes),
      Row(2, "b", java.time.LocalDate.of(2020, 1, 2), 43201000000000L, ldt(1),
        "31c9fe2a-4b23-4938-9b84-ae9ea1ef43f8", "Sam".getBytes),
      Row(3, "c", java.time.LocalDate.of(2020, 1, 3), 43202000000000L, ldt(2),
        "088a052c-aa47-41c2-b3b4-6813776d0edc", "James".getBytes))
    Fabrix(spark.createDataFrame(rows, schema), "id")
  }

  test("typed columns encode exactly like the reference (ec.rs:182 fragments)") {
    val json = JsonWire.toJson(typedFx, WireType.Column)
    // fragments verbatim from the reference golden string
    assert(json.contains("""{"name":"id","datatype":"I32","values":[1,2,3]}"""))
    assert(json.contains("""{"name":"date","datatype":"Date","values":[18262,18263,18264]}"""))
    assert(json.contains("""{"name":"time","datatype":"Time","values":[43200000000000,43201000000000,43202000000000]}"""))
    assert(json.contains("""{"name":"datetime","datatype":"DateTime","values":[1577880000000000000,1577880001000000000,1577880002000000000]}"""))
    assert(json.contains("""{"name":"uuid","datatype":"Uuid","values":["72b1e846-1f57-47da-bae0-9c08b0ba0fce","31c9fe2a-4b23-4938-9b84-ae9ea1ef43f8","088a052c-aa47-41c2-b3b4-6813776d0edc"]}"""))
    assert(json.contains("""{"name":"bytes","datatype":"Bytes","values":[[74,97,99,111,98],[83,97,109],[74,97,109,101,115]]}"""))
    assert(json.endsWith(""""index_tag":{"loc":0,"name":"id","data_type":"I32"}}"""))
  }

  test("row-wise shape (ec.rs:217 structure) and roundtrip") {
    val json = JsonWire.toJson(typedFx, WireType.Row)
    assert(json.contains(""""types":["I32","String","Date","Time","DateTime","Uuid","Bytes"]"""))
    assert(json.contains(""""id":1,"name":"a","date":18262,"time":43200000000000"""))
    val back = JsonWire.fromJson(spark, json, WireType.Row)
    assert(JsonWire.toJson(back, WireType.Row) == json)
  }

  test("dataset shape (ec.rs:252 structure) and roundtrip") {
    val json = JsonWire.toJson(typedFx, WireType.Dataset)
    assert(json.contains(""""names":["id","name","date","time","datetime","uuid","bytes"]"""))
    assert(json.contains("""[1,"a",18262,43200000000000,1577880000000000000,"72b1e846-1f57-47da-bae0-9c08b0ba0fce",[74,97,99,111,98]]"""))
    val back = JsonWire.fromJson(spark, json, WireType.Dataset)
    assert(JsonWire.toJson(back, WireType.Dataset) == json)
  }

  test("uniform-scale decimal roundtrips as plain strings") {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("d", DecimalType(20, 6))))
    val rows = java.util.Arrays.asList(
      Row(1, new java.math.BigDecimal("0.000021")),
      Row(2, new java.math.BigDecimal("1234.500000")))
    val fx = Fabrix(spark.createDataFrame(rows, schema))
    val json = JsonWire.toJson(fx, WireType.Column)
    assert(json.contains(""""datatype":"Decimal","values":["0.000021","1234.500000"]"""))
    val back = JsonWire.fromJson(spark, json, WireType.Column)
    assert(JsonWire.toJson(back, WireType.Column) == json)
  }

  test("toJson fails fast past spark.graft.positional.maxRows (DocStore insert shares the path)") {
    import spark.implicits._
    val fx = Fabrix((1 to 50).map(i => (i, s"d$i")).toDF("id", "v"))
    spark.conf.set(Fabrix.PositionalMaxRowsKey, "10")
    try {
      val ex = intercept[IllegalStateException](JsonWire.toJson(fx, WireType.Column))
      assert(ex.getMessage.contains(Fabrix.PositionalMaxRowsKey), ex.getMessage)
      // DocStore insert routes through toJson — same guard, same message
      val dir = Files.createTempDirectory("graft_docstore_guard")
      val store = new JsonDirStore(dir.toString)
      val ex2 = intercept[IllegalStateException](
        store.insert(fx, SavingCategory.Column))
      assert(ex2.getMessage.contains(Fabrix.PositionalMaxRowsKey), ex2.getMessage)
      // under the bound (and with the guard disabled) the codec works
      spark.conf.set(Fabrix.PositionalMaxRowsKey, "50")
      assert(JsonWire.toJson(fx, WireType.Column).nonEmpty)
      spark.conf.set(Fabrix.PositionalMaxRowsKey, "-1")
      assert(JsonWire.toJson(fx, WireType.Column).nonEmpty)
    } finally spark.conf.unset(Fabrix.PositionalMaxRowsKey)
  }

  test("u64 columns survive via metadata marker") {
    val meta = new MetadataBuilder().putString(JsonWire.MetaKey, "u64").build()
    val schema = StructType(Seq(StructField("u", DecimalType(20, 0), nullable = true, meta)))
    val rows = java.util.Arrays.asList(Row(new java.math.BigDecimal("18446744073709551615")))
    val fx = Fabrix(spark.createDataFrame(rows, schema))
    val json = JsonWire.toJson(fx, WireType.Column)
    assert(json.contains(""""datatype":"U64","values":[18446744073709551615]"""))
    val back = JsonWire.fromJson(spark, json, WireType.Column)
    assert(JsonWire.toJson(back, WireType.Column) == json)
  }
}
