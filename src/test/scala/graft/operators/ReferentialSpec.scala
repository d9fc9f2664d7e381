package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FK-orphan audit: hand orphan counts, NULL-FK convention, composite
  * keys, clean relations, config guards.
  */
class ReferentialSpec extends SparkSpec {

  import spark.implicits._
  import Referential.FkRelation

  test("orphans are non-null child keys with no parent; NULLs count separately") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None, None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Referential.audit(Seq(
      FkRelation("c.p", child, Seq("fk"), parent, Seq("pk")))).collect().head
    assert(r.getAs[Long]("n_child") == 5L)
    assert(r.getAs[Long]("n_null_fk") == 2L)
    assert(r.getAs[Long]("n_orphan") == 1L) // the 9
  }

  test("composite keys: a row is an orphan unless ALL columns match one parent row") {
    val child = Seq((1L, 1L), (1L, 2L), (2L, 1L)).toDF("a", "b")
    val parent = Seq((1L, 1L), (2L, 2L)).toDF("x", "y")
    val r = Referential.audit(Seq(
      FkRelation("c.p", child, Seq("a", "b"), parent, Seq("x", "y")))).collect().head
    assert(r.getAs[Long]("n_orphan") == 2L) // (1,2) and (2,1)
    // partial NULL in a composite key is n_null_fk, not an orphan
    val child2 = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
    val r2 = Referential.audit(Seq(
      FkRelation("c.p", child2, Seq("a", "b"), parent, Seq("x", "y")))).collect().head
    assert(r2.getAs[Long]("n_null_fk") == 1L)
    assert(r2.getAs[Long]("n_orphan") == 0L)
  }

  test("clean relation reports zeros; duplicate parents don't multi-count; empty child is all-zero") {
    val child = Seq(1L, 1L, 2L).toDF("fk")
    val parent = Seq(1L, 1L, 2L, 2L).toDF("pk") // dup parent keys
    val r = Referential.audit(Seq(
      FkRelation("c.p", child, Seq("fk"), parent, Seq("pk")))).collect().head
    assert(r.getAs[Long]("n_child") == 3L)
    assert(r.getAs[Long]("n_orphan") == 0L)
    val empty = spark.emptyDataset[Long].toDF("fk")
    val r2 = Referential.audit(Seq(
      FkRelation("e.p", empty, Seq("fk"), parent, Seq("pk")))).collect().head
    assert(r2.getAs[Long]("n_child") == 0L)
    assert(r2.getAs[Long]("n_null_fk") == 0L)
    assert(r2.getAs[Long]("n_orphan") == 0L)
  }

  test("several relations land as one row each, in one frame") {
    val a = Seq(1L).toDF("k"); val p = Seq(2L).toDF("k2")
    val out = Referential.audit(Seq(
      FkRelation("r1", a, Seq("k"), p, Seq("k2")),
      FkRelation("r2", a, Seq("k"), a, Seq("k"))))
      .orderBy("relation").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("r1", "r2"))
    assert(out(0).getAs[Long]("n_orphan") == 1L)
    assert(out(1).getAs[Long]("n_orphan") == 0L)
  }

  test("config guards: empty list, duplicate names, key arity") {
    val a = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] { Referential.audit(Nil) }
    intercept[IllegalArgumentException] {
      Referential.audit(Seq(
        FkRelation("r", a, Seq("k"), a, Seq("k")),
        FkRelation("r", a, Seq("k"), a, Seq("k"))))
    }
    intercept[IllegalArgumentException] {
      FkRelation("r", a, Seq("k"), a, Seq.empty)
    }
  }
}
