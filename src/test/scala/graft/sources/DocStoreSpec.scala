package graft.sources

import graft.SparkSpec
import graft.core.Fabrix

/** DocumentStore CRUD roundtrip, mirroring the reference's find-back test
  * (fabrix-mg/src/dy.rs:450): insert a frame, find it by id, compare.
  */
class DocStoreSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def freshStore() =
    new JsonDirStore(s"/tmp/graft_docstore_${java.util.UUID.randomUUID()}")

  private lazy val frame: Fabrix = {
    import spark.implicits._
    Fabrix(Seq((1L, "Jacob", 85.5), (2L, "Sam", 62.0)).toDF("id", "name", "score"), "id")
  }

  private def rowsOf(fx: Fabrix): Seq[Row] = fx.df.orderBy("id").collect().toSeq

  test("insert then find roundtrips all three saving categories") {
    val store = freshStore()
    for (cat <- Seq(SavingCategory.Column, SavingCategory.Row, SavingCategory.Dataset)) {
      val id = store.insert(frame, cat)
      val back = store.find(spark, id).getOrElse(fail(s"$cat: not found"))
      assert(rowsOf(back) == rowsOf(frame), s"category $cat")
      assert(back.indexTag.map(_.name).contains("id"), s"category $cat keeps index tag")
    }
  }

  test("put replaces in place; delete removes; find on missing id is None") {
    val store = freshStore()
    store.put("doc1", frame)
    val smaller = Fabrix(frame.df.where(frame.df("id") === 1L), frame.indexTag)
    store.put("doc1", smaller)
    assert(store.find(spark, "doc1").get.df.count() == 1)
    assert(store.delete("doc1"))
    assert(!store.delete("doc1"))
    assert(store.find(spark, "missing").isEmpty)
  }

  test("findAll skips missing ids; listIds sorted") {
    val store = freshStore()
    store.put("b", frame); store.put("a", frame)
    assert(store.listIds == Seq("a", "b"))
    assert(store.findAll(spark, Seq("a", "nope", "b")).length == 2)
  }

  test("stored document is the bare wire JSON with detectable shape") {
    import graft.wire.JsonWire.WireType
    val dir = s"/tmp/graft_docstore_${java.util.UUID.randomUUID()}"
    val store = new JsonDirStore(dir)
    store.put("c", frame, SavingCategory.Column)
    store.put("r", frame, SavingCategory.Row)
    store.put("d", frame, SavingCategory.Dataset)
    def shape(id: String) = DocumentStore.detectWireType(
      java.nio.file.Files.readString(java.nio.file.Paths.get(dir, s"$id.json")))
    assert(shape("c") == WireType.Column)
    assert(shape("r") == WireType.Row)
    assert(shape("d") == WireType.Dataset)
  }

  test("ids with path separators are rejected") {
    val store = freshStore()
    intercept[IllegalArgumentException](store.put("../evil", frame))
  }

  test("index management: create/list/drop with reference naming") {
    val store = freshStore()
    assert(store.listIndexes.isEmpty)
    // single-index naming `_idx_<field>` (reference indexes.rs:69)
    val single = IndexModel.single("name", unique = true)
    assert(store.createIndex(single) == "_idx_name")
    // compound naming `_idx_<f1>_<f2>_` with trailing sep (indexes.rs:85-89)
    val compound = IndexModel.compound(
      Seq(IndexKey("id"), IndexKey("score", IndexDir.Desc)))
    assert(store.createIndex(compound) == "_idx_id_score_")
    assert(store.listIndexNames == Seq("_idx_name", "_idx_id_score_"))
    // manifest round-trips full models (dirs, unique) through a reopen
    val reopened = new JsonDirStore(store.dir)
    assert(reopened.listIndexes == Seq(single, compound))
    // create is an idempotent upsert by name
    assert(reopened.createIndex(single.copy(unique = false)) == "_idx_name")
    assert(reopened.listIndexes.count(_.name == "_idx_name") == 1)
    assert(!reopened.listIndexes.find(_.name == "_idx_name").get.unique)
    // drop
    assert(reopened.dropIndex("_idx_name"))
    assert(!reopened.dropIndex("_idx_name"))
    reopened.dropAllIndexes()
    assert(reopened.listIndexes.isEmpty)
  }

  test("index manifest is invisible to document CRUD") {
    val store = freshStore()
    store.createIndex(IndexModel.single("id"))
    val id = store.insert(frame)
    assert(store.listIds == Seq(id))
    intercept[IllegalArgumentException](store.put("_indexes", frame))
  }

  test("corrupt manifest entries degrade gracefully instead of NPE") {
    val store = freshStore()
    store.createIndex(IndexModel.single("name"))
    // hand-edit the manifest: one valid entry, one missing keys, one with a
    // keyless object, one missing name — only the valid one must survive
    val manifest = java.nio.file.Paths.get(store.dir, "_indexes.json")
    java.nio.file.Files.writeString(manifest,
      """[{"name":"_idx_name","keys":[{"field":"name"}]},
        |{"name":"no_keys"},
        |{"name":"empty_keys","keys":[{}]},
        |{"keys":[{"field":"orphan"}]}]""".stripMargin)
    assert(store.listIndexNames == Seq("_idx_name"))
    // defaults fill absent dir/unique/text fields
    val m = store.listIndexes.head
    assert(m.keys == Seq(IndexKey("name", IndexDir.Asc)) && !m.unique && !m.text)
  }

  test("catalog: show_dbs / show_collections / drop verbs (reference ec.rs:147-167,232-249)") {
    val cat = new JsonDirCatalog(s"/tmp/graft_catalog_${java.util.UUID.randomUUID()}")
    assert(cat.listDatabases.isEmpty)
    val s1 = cat.store("db1", "people")
    cat.store("db1", "orders")
    cat.store("db2", "logs")
    assert(cat.listDatabases == Seq("db1", "db2"))
    assert(cat.listCollections("db1") == Seq("orders", "people"))
    assert(cat.listCollections("nope").isEmpty)
    // a catalog-opened store is a full DocumentStore (CRUD + indexes)
    val id = s1.insert(frame)
    assert(cat.store("db1", "people").find(spark, id).isDefined)
    // drop_collection removes documents and manifest alike
    s1.createIndex(IndexModel.single("id"))
    assert(cat.dropCollection("db1", "people"))
    assert(!cat.dropCollection("db1", "people"))
    assert(cat.listCollections("db1") == Seq("orders"))
    // drop_database removes the whole namespace
    assert(cat.dropDatabase("db1"))
    assert(cat.listDatabases == Seq("db2"))
    assert(!cat.dropDatabase("db1"))
    // namespace names are path-safe
    intercept[IllegalArgumentException](cat.store("../evil", "c"))
    intercept[IllegalArgumentException](cat.dropDatabase(".."))
  }
}
