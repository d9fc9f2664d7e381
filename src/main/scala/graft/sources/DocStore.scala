package graft.sources

import graft.core.Fabrix
import graft.wire.JsonWire
import graft.wire.JsonWire.WireType
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Document-store CRUD of wire-serialized frames — the Mongo-shaped surface
  * (reference S10/S11: fabrix-mg/src/dy.rs:296-329 find_fx/find_fxs,
  * fabrix/src/sources/mongo/writer.rs:15-135 save categories) behind a
  * pluggable trait so the engine stays testable offline (SURVEY §7 plan:
  * JSON-dir implementation; a real MongoDB binding implements the same trait
  * with the same wire documents as collection entries).
  *
  * The stored document IS the wire JSON (no envelope): its shape already
  * identifies the saving category, mirroring how the reference stores the
  * serialized frame as the Mongo document body. The reference implements
  * only `Column` (Row/Dataset are `todo!()`, writer.rs:54-60); we support
  * all three.
  *
  * Scale note: a document store is an API/interop boundary for HTTP-sized
  * frames (the wire codec collects to the driver by design); bulk data goes
  * through the parquet/JDBC paths.
  */
sealed trait SavingCategory { def wire: WireType }
object SavingCategory {
  case object Column  extends SavingCategory { val wire: WireType = WireType.Column }
  case object Row     extends SavingCategory { val wire: WireType = WireType.Row }
  case object Dataset extends SavingCategory { val wire: WireType = WireType.Dataset }
}

trait DocumentStore {
  /** Insert under a fresh id (reference insert → ObjectId). */
  def insert(fx: Fabrix, category: SavingCategory = SavingCategory.Column): String
  /** Insert/replace under a caller-chosen id (reference replace_fx). */
  def put(id: String, fx: Fabrix, category: SavingCategory = SavingCategory.Column): Unit
  /** find_fx: fetch one document by id. */
  def find(spark: SparkSession, id: String): Option[Fabrix]
  /** find_fxs: fetch many by id, silently skipping missing ones. */
  def findAll(spark: SparkSession, ids: Seq[String]): Seq[Fabrix] =
    ids.flatMap(find(spark, _))
  def delete(id: String): Boolean
  def listIds: Seq[String]
}

object DocumentStore {
  /** The wire shape identifies the category: Column = data is an array;
    * Row = data.types present without names; Dataset = data.names present.
    */
  def detectWireType(json: String): WireType = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val data = root.get("data")
    if (data == null) throw new IllegalArgumentException("not a wire document: no data")
    if (data.isArray) WireType.Column
    else if (data.has("names")) WireType.Dataset
    else if (data.has("types")) WireType.Row
    else throw new IllegalArgumentException("unrecognized wire document shape")
  }
}

/** Local filesystem implementation: one `<id>.json` per document. */
final class JsonDirStore(dir: String) extends DocumentStore {
  private val root: Path = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    p
  }

  private def fileOf(id: String): Path = {
    require(id.nonEmpty && !id.exists(c => c == '/' || c == '\\' || c == 0),
      s"invalid document id: $id")
    root.resolve(s"$id.json")
  }

  override def insert(fx: Fabrix, category: SavingCategory): String = {
    val id = java.util.UUID.randomUUID().toString
    put(id, fx, category)
    id
  }

  override def put(id: String, fx: Fabrix, category: SavingCategory): Unit =
    Files.writeString(fileOf(id), JsonWire.toJson(fx, category.wire))

  override def find(spark: SparkSession, id: String): Option[Fabrix] = {
    val f = fileOf(id)
    if (!Files.exists(f)) None
    else {
      val json = Files.readString(f)
      Some(JsonWire.fromJson(spark, json, DocumentStore.detectWireType(json)))
    }
  }

  override def delete(id: String): Boolean = Files.deleteIfExists(fileOf(id))

  override def listIds: Seq[String] =
    Files.list(root).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json"))
      .toSeq.sorted
}
