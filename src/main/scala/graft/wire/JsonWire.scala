package graft.wire

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import graft.core.{Fabrix, FxType, IndexTag}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** DataFrame JSON wire codec — byte-exact parity with the reference's three
  * wire shapes (fabrix-json/src/ft.rs:13-101; golden strings
  * fabrix-json/src/ec.rs:150,182,217,252):
  *
  *  - Column:  {"data":[{"name","datatype","values":[…]},…],"index_tag":…}
  *  - Row:     {"data":{"types":[…],"values":[{col:val,…},…]},"index_tag":…}
  *  - Dataset: {"data":{"names":[…],"types":[…],"values":[[…],…]},"index_tag":…}
  *
  * Cell encodings: Date = epoch days, Time = nanos-of-day, DateTime = epoch
  * nanos, Decimal = plain string, Uuid = canonical string, Bytes = int array.
  *
  * This is an interop/API boundary for HTTP-sized frames — it collects to the
  * driver by design (the reference's formats are single JSON documents).
  * Large-frame serde goes through the JsonLines source instead (S5/S6).
  */
object JsonWire {

  sealed trait WireType
  object WireType {
    case object Column  extends WireType
    case object Row     extends WireType
    case object Dataset extends WireType
  }

  /** ValueType variant name on the wire (fabrix-core/src/value.rs:229-250). */
  def wireName(t: FxType): String = t match {
    case FxType.TBool          => "Bool"
    case FxType.TU8            => "U8"
    case FxType.TU16           => "U16"
    case FxType.TU32           => "U32"
    case FxType.TU64           => "U64"
    case FxType.TI8            => "I8"
    case FxType.TI16           => "I16"
    case FxType.TI32           => "I32"
    case FxType.TI64           => "I64"
    case FxType.TF32           => "F32"
    case FxType.TF64           => "F64"
    case FxType.TString        => "String"
    case FxType.TDate          => "Date"
    case FxType.TTime          => "Time"
    case FxType.TDateTime      => "DateTime"
    case _: FxType.TDecimal    => "Decimal"
    case FxType.TUuid          => "Uuid"
    case FxType.TBytes         => "Bytes"
    case FxType.TNull          => "Null"
  }

  def parseWireName(s: String): FxType = s match {
    case "Bool"     => FxType.TBool
    case "U8"       => FxType.TU8
    case "U16"      => FxType.TU16
    case "U32"      => FxType.TU32
    case "U64"      => FxType.TU64
    case "I8"       => FxType.TI8
    case "I16"      => FxType.TI16
    case "I32"      => FxType.TI32
    case "I64"      => FxType.TI64
    case "F32"      => FxType.TF32
    case "F64"      => FxType.TF64
    case "String"   => FxType.TString
    case "Date"     => FxType.TDate
    case "Time"     => FxType.TTime
    case "DateTime" => FxType.TDateTime
    case "Decimal"  => FxType.TDecimal(38, 18)
    case "Uuid"     => FxType.TUuid
    case "Bytes"    => FxType.TBytes
    case "Null"     => FxType.TNull
    case other      => throw new IllegalArgumentException(s"unknown wire type $other")
  }

  /** Spark field → wire type, honoring the metadata markers that preserve
    * the reference types Spark lacks (time/uuid, SURVEY §1.2).
    */
  def fieldWireType(f: StructField): FxType = {
    val marker = if (f.metadata.contains(MetaKey)) Some(f.metadata.getString(MetaKey)) else None
    (marker, f.dataType) match {
      case (Some("time"), LongType)   => FxType.TTime
      case (Some("uuid"), StringType) => FxType.TUuid
      case (Some(u), _) if u.startsWith("u") => parseWireName(u.toUpperCase)
      case (_, dt) => FxType.fromSpark(dt)
    }
  }

  val MetaKey = "graft.type"

  private val F = JsonNodeFactory.instance
  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------- encoding --

  private def encodeCell(v: Any, t: FxType): JsonNode = v match {
    case null => F.nullNode()
    case _ => t match {
      case FxType.TBool     => F.booleanNode(v.asInstanceOf[Boolean])
      case FxType.TI8       => F.numberNode(v.asInstanceOf[Byte].toInt)
      case FxType.TI16 | FxType.TU8 => F.numberNode(v.asInstanceOf[Short].toInt)
      case FxType.TI32 | FxType.TU16 => F.numberNode(v.asInstanceOf[Int])
      case FxType.TI64 | FxType.TU32 => F.numberNode(v.asInstanceOf[Long])
      case FxType.TU64      => F.numberNode(v.asInstanceOf[java.math.BigDecimal].toBigInteger)
      case FxType.TF32      => F.numberNode(v.asInstanceOf[Float])
      case FxType.TF64      => F.numberNode(v.asInstanceOf[Double])
      case FxType.TString   => F.textNode(v.toString)
      case FxType.TDate     => F.numberNode(v match {
        case d: java.sql.Date       => d.toLocalDate.toEpochDay
        case d: java.time.LocalDate => d.toEpochDay
      })
      case FxType.TTime     => F.numberNode(v.asInstanceOf[Long])
      case FxType.TDateTime => F.numberNode(v match {
        case ts: java.time.LocalDateTime =>
          ts.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + ts.getNano
        case ts: java.sql.Timestamp => ts.getTime / 1000 * 1000000000L + ts.getNanos
        case ts: java.time.Instant  => ts.getEpochSecond * 1000000000L + ts.getNano
      })
      case _: FxType.TDecimal =>
        F.textNode(v.asInstanceOf[java.math.BigDecimal].toPlainString)
      case FxType.TUuid     => F.textNode(v.toString)
      case FxType.TBytes    =>
        val arr = F.arrayNode()
        v.asInstanceOf[Array[Byte]].foreach(b => arr.add(b & 0xff))
        arr
      case FxType.TNull     => F.nullNode()
    }
  }

  private def indexTagNode(fx: Fabrix): JsonNode = fx.indexTag match {
    case None => F.nullNode()
    case Some(IndexTag(name, _)) =>
      val loc = fx.df.columns.indexOf(name)
      val t = fieldWireType(fx.df.schema(name))
      val o = F.objectNode()
      o.put("loc", loc)
      o.put("name", name)
      o.put("data_type", wireName(t))
      o
  }

  def toJson(fx: Fabrix, typ: WireType): String = {
    val fields = fx.df.schema.fields
    val types = fields.map(fieldWireType)
    // the wire codec driver-materializes the frame by intent (API-sized
    // parity frames — the reference does the same); bound it on the same
    // key as the other driver-materializing APIs so a corpus frame fails
    // FAST with a named message instead of OOMing the driver. A
    // limit(max+1) probe costs one early-stopping pass, not a count.
    val max = fx.df.sparkSession.conf
      .get(Fabrix.PositionalMaxRowsKey, Fabrix.DefaultPositionalMaxRows.toString)
      .toLong
    val rows: Array[Row] =
      if (max > 0 && max < Int.MaxValue) {
        val probed = fx.df.limit(max.toInt + 1).collect()
        if (probed.length > max) throw new IllegalStateException(
          s"toJson materializes the whole frame on the driver and it exceeds " +
            s"${Fabrix.PositionalMaxRowsKey}=$max rows. The JSON wire codec is " +
            "an in-memory-parity API, not a bulk exporter; write parquet/CSV " +
            "for bulk, or raise the conf to override.")
        probed
      } else fx.df.collect()
    val root = F.objectNode()
    typ match {
      case WireType.Column =>
        val data = F.arrayNode()
        fields.zipWithIndex.foreach { case (f, i) =>
          val colObj = F.objectNode()
          colObj.put("name", f.name)
          colObj.put("datatype", wireName(types(i)))
          val vals = F.arrayNode()
          rows.foreach(r => vals.add(encodeCell(r.get(i), types(i))))
          colObj.set[ObjectNode]("values", vals)
          data.add(colObj)
        }
        root.set[ObjectNode]("data", data)
      case WireType.Row =>
        val data = F.objectNode()
        val tarr = F.arrayNode(); types.foreach(t => tarr.add(wireName(t)))
        data.set[ObjectNode]("types", tarr)
        val vals = F.arrayNode()
        rows.foreach { r =>
          val o = F.objectNode()
          fields.zipWithIndex.foreach { case (f, i) => o.set[ObjectNode](f.name, encodeCell(r.get(i), types(i))) }
          vals.add(o)
        }
        data.set[ObjectNode]("values", vals)
        root.set[ObjectNode]("data", data)
      case WireType.Dataset =>
        val data = F.objectNode()
        val narr = F.arrayNode(); fields.foreach(f => narr.add(f.name))
        val tarr = F.arrayNode(); types.foreach(t => tarr.add(wireName(t)))
        data.set[ObjectNode]("names", narr)
        data.set[ObjectNode]("types", tarr)
        val vals = F.arrayNode()
        rows.foreach { r =>
          val a = F.arrayNode()
          fields.indices.foreach(i => a.add(encodeCell(r.get(i), types(i))))
          vals.add(a)
        }
        data.set[ObjectNode]("values", vals)
        root.set[ObjectNode]("data", data)
    }
    root.set[ObjectNode]("index_tag", indexTagNode(fx))
    mapper.writeValueAsString(root)
  }

  // ------------------------------------------------------------- decoding --

  private def decodeCell(n: JsonNode, t: FxType): Any =
    if (n == null || n.isNull) null
    else t match {
      case FxType.TBool     => n.asBoolean()
      case FxType.TI8       => n.asInt().toByte
      case FxType.TI16 | FxType.TU8 => n.asInt().toShort
      case FxType.TI32 | FxType.TU16 => n.asInt()
      case FxType.TI64 | FxType.TU32 => n.asLong()
      case FxType.TU64      => new java.math.BigDecimal(n.bigIntegerValue())
      case FxType.TF32      => n.floatValue()
      case FxType.TF64      => n.doubleValue()
      case FxType.TString | FxType.TUuid => n.asText()
      case FxType.TDate     => java.time.LocalDate.ofEpochDay(n.asLong())
      case FxType.TTime     => n.asLong()
      case FxType.TDateTime =>
        val nanos = n.asLong()
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(nanos, 1000000000L), Math.floorMod(nanos, 1000000000L).toInt,
          java.time.ZoneOffset.UTC)
      case _: FxType.TDecimal => new java.math.BigDecimal(n.asText())
      case FxType.TBytes    =>
        val it = n.elements(); val buf = Array.newBuilder[Byte]
        while (it.hasNext) buf += it.next().asInt().toByte
        buf.result()
      case FxType.TNull     => null
    }

  private def sparkField(name: String, t: FxType): StructField = {
    val meta = t match {
      case FxType.TTime => new MetadataBuilder().putString(MetaKey, "time").build()
      case FxType.TUuid => new MetadataBuilder().putString(MetaKey, "uuid").build()
      case FxType.TU8 | FxType.TU16 | FxType.TU32 | FxType.TU64 =>
        new MetadataBuilder().putString(MetaKey, wireName(t).toLowerCase).build()
      case _ => Metadata.empty
    }
    StructField(name, t.sparkType, nullable = true, meta)
  }

  def fromJson(spark: SparkSession, json: String, typ: WireType): Fabrix = {
    val root = mapper.readTree(json)
    val (names, types, cells): (Seq[String], Seq[FxType], Seq[Seq[Any]]) = typ match {
      case WireType.Column =>
        val data = root.get("data")
        val cols = (0 until data.size).map(data.get)
        val ns = cols.map(_.get("name").asText())
        val ts = cols.map(c => parseWireName(c.get("datatype").asText()))
        val colVals = cols.zip(ts).map { case (c, t) =>
          val vs = c.get("values")
          (0 until vs.size).map(i => decodeCell(vs.get(i), t))
        }
        val nRows = colVals.headOption.map(_.size).getOrElse(0)
        (ns, ts, (0 until nRows).map(i => colVals.map(_(i))))
      case WireType.Row =>
        val data = root.get("data")
        val vals = data.get("values")
        val tarr = data.get("types")
        val ts = (0 until tarr.size).map(i => parseWireName(tarr.get(i).asText()))
        val ns =
          if (vals.size > 0) {
            val it = vals.get(0).fieldNames(); val b = Seq.newBuilder[String]
            while (it.hasNext) b += it.next(); b.result()
          } else {
            // zero-row row-wise document: no values object to read names
            // from — preserve the declared "types" width, naming the index
            // column from index_tag and the rest Column_{i} (ADVICE r1:
            // a zero-row roundtrip must not collapse to an empty schema).
            val tagNode = root.get("index_tag")
            val tagLoc = if (tagNode == null || tagNode.isNull) -1 else tagNode.get("loc").asInt()
            ts.indices.map { i =>
              if (i == tagLoc) tagNode.get("name").asText() else s"Column_$i"
            }
          }
        val rows = (0 until vals.size).map { i =>
          val o = vals.get(i)
          ns.zip(ts).map { case (n, t) => decodeCell(o.get(n), t) }
        }
        (ns, ts, rows)
      case WireType.Dataset =>
        val data = root.get("data")
        val narr = data.get("names"); val tarr = data.get("types")
        val ns = (0 until narr.size).map(narr.get(_).asText())
        val ts = (0 until tarr.size).map(i => parseWireName(tarr.get(i).asText()))
        val vals = data.get("values")
        val rows = (0 until vals.size).map { i =>
          val a = vals.get(i)
          ts.zipWithIndex.map { case (t, j) => decodeCell(a.get(j), t) }
        }
        (ns, ts, rows)
    }
    // Decimal columns: infer the column scale/precision from the decoded
    // values (the wire has no declared scale; reference decimals are
    // per-value-scaled) so plain-string re-encoding is stable.
    val inferredTypes = types.zipWithIndex.map {
      case (_: FxType.TDecimal, i) =>
        val ds = cells.flatMap(r => Option(r(i))).map(_.asInstanceOf[java.math.BigDecimal])
        if (ds.isEmpty) FxType.TDecimal(38, 18)
        else {
          val scale = ds.map(_.scale).max
          val intDigits = ds.map(d => d.precision - d.scale).max
          FxType.TDecimal(math.min(38, math.max(1, intDigits + scale)), scale)
        }
      case (t, _) => t
    }
    val schema = StructType(names.zip(inferredTypes).map { case (n, t) => sparkField(n, t) })
    val rows = cells.map(Row.fromSeq)
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    val tagNode = root.get("index_tag")
    val fx = Fabrix(df)
    if (tagNode == null || tagNode.isNull) fx
    else fx.setIndexTag(tagNode.get("name").asText())
  }
}
