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

/** Index sort direction (reference indexes.rs:11 `Dir`). */
sealed trait IndexDir
object IndexDir {
  case object Asc extends IndexDir
  case object Desc extends IndexDir
}

/** One indexed key: field + direction (reference indexes.rs:17 SingleIndex
  * key pair / CompoundIndexOptions keys entry).
  */
final case class IndexKey(field: String, dir: IndexDir = IndexDir.Asc)

/** A named index over one or more keys — the union of the reference's
  * Single/Compound IndexOptions (indexes.rs:47): a single-field model is a
  * one-key compound. `text` is carried but inert, exactly like the
  * reference (text search is commented out in
  * generate_mongo_index_module, indexes.rs:70,82).
  */
final case class IndexModel(name: String, keys: Seq[IndexKey],
                            unique: Boolean = false, text: Boolean = false) {
  require(name.nonEmpty, "index name must be non-empty")
  require(keys.nonEmpty, "index must cover at least one key")
}

object IndexModel {
  private val Prefix = "idx" // reference indexes.rs:8 INDEXES_PREFIX

  /** Reference single-index naming: `_idx_<field>` (indexes.rs:69). */
  def single(field: String, dir: IndexDir = IndexDir.Asc,
             unique: Boolean = false, text: Boolean = false): IndexModel =
    IndexModel(s"_${Prefix}_$field", Seq(IndexKey(field, dir)), unique, text)

  /** Reference compound naming: `_idx_<f1>_<f2>_…` with a trailing
    * separator (indexes.rs:85-89 folds `name + '_'` per key).
    */
  def compound(keys: Seq[IndexKey], unique: Boolean = false,
               text: Boolean = false): IndexModel =
    IndexModel(s"_${Prefix}_${keys.map(_.field + "_").mkString}", keys, unique, text)
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

  // ------------------------- index management (reference ec.rs:172-230) --
  // The default `_id` index is never listed, matching the reference's
  // IndexOptions doc ("the default `_id` index is not included").

  /** list_indexes: every declared index model. */
  def listIndexes: Seq[IndexModel]
  /** list_indexes_name (ec.rs:186). */
  def listIndexNames: Seq[String] = listIndexes.map(_.name)
  /** create_index (ec.rs:193): upserts by name, returns the index name —
    * mirroring Mongo's idempotent create returning `index_name`.
    */
  def createIndex(model: IndexModel): String
  /** drop_index by name (ec.rs:216); false if absent. */
  def dropIndex(name: String): Boolean
  /** drop_all_indexes (ec.rs:224). */
  def dropAllIndexes(): Unit
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
final class JsonDirStore(val dir: String) extends DocumentStore {
  private val root: Path = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    p
  }

  private def fileOf(id: String): Path = {
    require(id.nonEmpty && !id.exists(c => c == '/' || c == '\\' || c == 0),
      s"invalid document id: $id")
    require(id != JsonDirStore.ManifestName, s"reserved document id: $id")
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

  override def listIds: Seq[String] = {
    val s = Files.list(root)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json"))
      .filter(_ != JsonDirStore.ManifestName)
      .toSeq.sorted
    finally s.close() // the DirectoryStream fd is not GC-bound
  }

  // ------------------------------------ index manifest (`_indexes.json`) --
  // The JSON-dir store has nothing to physically index (every find is a
  // direct file lookup), so index management is pure declared metadata — a
  // manifest the way a real binding would hold the collection's index list.
  // The API surface and naming mirror the reference exactly so a Mongo-
  // backed implementation slots in behind the same trait.

  private val manifest: Path = root.resolve(s"${JsonDirStore.ManifestName}.json")

  private def readManifest(): Seq[IndexModel] = {
    if (!Files.exists(manifest)) Seq.empty
    else {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      // a hand-edited or older-format manifest must degrade gracefully, not
      // NPE every index API: path() never returns null, asText/asBoolean
      // take defaults, and entries with no usable name or keys are skipped
      om.readTree(Files.readString(manifest)).elements().asScala.flatMap { n =>
        val name = n.path("name").asText("")
        val keys = n.path("keys").elements().asScala.flatMap { k =>
          val field = k.path("field").asText("")
          if (field.isEmpty) None
          else Some(IndexKey(field,
            if (k.path("dir").asText("asc") == "desc") IndexDir.Desc else IndexDir.Asc))
        }.toSeq
        if (name.isEmpty || keys.isEmpty) None
        else Some(IndexModel(name, keys,
          unique = n.path("unique").asBoolean(false),
          text = n.path("text").asBoolean(false)))
      }.toSeq
    }
  }

  private def writeManifest(ms: Seq[IndexModel]): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = om.createArrayNode()
    ms.foreach { m =>
      val node = arr.addObject()
      node.put("name", m.name)
      node.put("unique", m.unique)
      node.put("text", m.text)
      val keys = node.putArray("keys")
      m.keys.foreach { k =>
        val kn = keys.addObject()
        kn.put("field", k.field)
        kn.put("dir", if (k.dir == IndexDir.Desc) "desc" else "asc")
      }
    }
    Files.writeString(manifest, om.writeValueAsString(arr))
  }

  override def listIndexes: Seq[IndexModel] = readManifest()

  override def createIndex(model: IndexModel): String = {
    writeManifest(readManifest().filterNot(_.name == model.name) :+ model)
    model.name
  }

  override def dropIndex(name: String): Boolean = {
    val before = readManifest()
    val after = before.filterNot(_.name == name)
    if (after.size == before.size) false
    else { writeManifest(after); true }
  }

  override def dropAllIndexes(): Unit =
    if (Files.exists(manifest)) { Files.delete(manifest); () }
}

object JsonDirStore {
  /** Reserved basename of the index manifest inside a store directory. */
  val ManifestName = "_indexes"
}

/** Database/collection admin verbs — the connection-level surface above a
  * single collection-shaped [[DocumentStore]] (reference ec.rs:147-167
  * `show_dbs`/`show_collections`, ec.rs:232-249
  * `drop_database`/`drop_collection`). The reference executor holds the
  * current database/collection as mutable state (`set_database` /
  * `set_collection`, ec.rs:128-144); here the namespace is explicit
  * arguments to the same verbs. Like [[DynConn]], this is a driver-side
  * service concern — executors/tasks never see it.
  */
trait DocumentCatalog {
  /** show_dbs: database names (ec.rs:148). */
  def listDatabases: Seq[String]
  /** show_collections: collection names in a database (ec.rs:159). */
  def listCollections(db: String): Seq[String]
  /** Open a collection as a [[DocumentStore]] (the `schema::<T>()` handle
    * the reference CRUD verbs run against).
    */
  def store(db: String, collection: String): DocumentStore
  /** drop_database (ec.rs:232); false if it did not exist. */
  def dropDatabase(db: String): Boolean
  /** drop_collection (ec.rs:243); false if it did not exist. */
  def dropCollection(db: String, collection: String): Boolean
}

/** Filesystem catalog: `<root>/<db>/<collection>/<id>.json` — each
  * collection directory IS a [[JsonDirStore]]. `store` creates the
  * directory eagerly (a Mongo collection appears on first write; a
  * directory-backed one on open — both idempotent).
  */
final class JsonDirCatalog(rootDir: String) extends DocumentCatalog {
  private val root: Path = {
    val p = Paths.get(rootDir)
    Files.createDirectories(p)
    p
  }

  private def checked(name: String): String = {
    require(name.nonEmpty && name != "." && name != ".." &&
      !name.exists(c => c == '/' || c == '\\' || c == 0),
      s"invalid namespace name: $name")
    name
  }

  private def listDirs(p: Path): Seq[String] =
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter(Files.isDirectory(_))
        .map(_.getFileName.toString)
        .toSeq.sorted
      finally s.close() // directory-stream fds are not GC-bound
    }

  private def deleteRecursively(p: Path): Boolean =
    if (!Files.exists(p)) false
    else {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
      finally s.close()
      true
    }

  override def listDatabases: Seq[String] = listDirs(root)

  override def listCollections(db: String): Seq[String] =
    listDirs(root.resolve(checked(db)))

  override def store(db: String, collection: String): DocumentStore =
    new JsonDirStore(root.resolve(checked(db)).resolve(checked(collection)).toString)

  override def dropDatabase(db: String): Boolean =
    deleteRecursively(root.resolve(checked(db)))

  override def dropCollection(db: String, collection: String): Boolean =
    deleteRecursively(root.resolve(checked(db)).resolve(checked(collection)))
}
