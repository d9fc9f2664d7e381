package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the FK-orphan readout a pipeline runs
  * beside [[ContractAudit.audit]] before publishing a snapshot: contract
  * rules are ROW-local, while "every lineitem names a real order" is a
  * CROSS-table invariant, and a broken one silently turns downstream
  * inner joins into row-droppers (the worst failure mode: no error,
  * smaller answers).
  *
  * Semantics follow SQL's FK convention: a child row with ANY NULL key
  * column is counted in `n_null_fk` and is NOT an orphan (absence is
  * [[ContractAudit]]'s NotNull job); `n_orphan` counts non-null-keyed
  * child rows with no parent match on ALL key columns. Composite keys
  * are first-class. Declared-subset parents are legitimate inputs (audit
  * against an allowlist, a restricted dimension, a previous snapshot).
  *
  * Scale shape: per relation, the parent collapses to its DISTINCT
  * keyset (partial-agg'd, usually dim-sized → broadcast by AQE) and the
  * child anti-joins on the key columns only — never a row-width
  * shuffle; the three counts are one partial-agg'd pass each; output is
  * relations-sized. The per-relation loop builds ONE union plan
  * (relations are a declared config list, not data).
  */
object Referential {

  /** One declared FK: `name` labels the output row; keys match
    * positionally (childKeys(i) ↔ parentKeys(i)).
    */
  final case class FkRelation(
      name: String,
      child: DataFrame, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String]) {
    require(childKeys.nonEmpty && childKeys.length == parentKeys.length,
      s"FkRelation '$name': childKeys and parentKeys must be non-empty and same-length")
  }

  /** One row per relation: (relation, n_child, n_null_fk, n_orphan). */
  def audit(relations: Seq[FkRelation]): DataFrame = {
    require(relations.nonEmpty, "audit needs at least one relation")
    require(relations.map(_.name).distinct.length == relations.length,
      "relation names must be unique — they are the output key")
    val perRelation = relations.map { r =>
      val ks = r.childKeys.indices.map(i => s"__k$i")
      val childK = r.child.select(
        r.childKeys.zip(ks).map { case (c, k) => col(c).as(k) }: _*)
      val anyNull = ks.map(col(_).isNull).reduce(_ || _)
      val base = childK.agg(
        count(lit(1)).as("n_child"),
        coalesce(sum(when(anyNull, 1L).otherwise(0L)), lit(0L)).as("n_null_fk"))
      val parentKeys = r.parent.select(
        r.parentKeys.zip(ks).map { case (c, k) => col(c).as(k) }: _*)
        .distinct()
      val orphans = childK.where(!anyNull)
        .join(parentKeys, ks, "left_anti")
        .agg(count(lit(1)).as("n_orphan"))
      // two 1-row frames — the declared-safe cross join shape
      base.crossJoin(orphans).select(
        lit(r.name).as("relation"),
        col("n_child"), col("n_null_fk"), col("n_orphan"))
    }
    perRelation.reduce(_ union _)
  }

  /** DuckDB replay for ONE relation — NOT EXISTS on all key columns,
    * FILTER-counted in a single pass. `childSql`/`parentSql` are
    * relation-yielding SQL; keys are column names within them.
    */
  def relationOracle(name: String, childSql: String, childKeys: Seq[String],
                     parentSql: String, parentKeys: Seq[String]): String = {
    val anyNull = childKeys.map(k => s"c.$k IS NULL").mkString(" OR ")
    val allNotNull = childKeys.map(k => s"c.$k IS NOT NULL").mkString(" AND ")
    val eq = childKeys.zip(parentKeys)
      .map { case (ck, pk) => s"p.$pk = c.$ck" }.mkString(" AND ")
    s"""SELECT '$name' AS relation,
  CAST(count(*) AS BIGINT) AS n_child,
  CAST(count(*) FILTER (WHERE $anyNull) AS BIGINT) AS n_null_fk,
  CAST(count(*) FILTER (WHERE $allNotNull AND NOT EXISTS
    (SELECT 1 FROM ($parentSql) p WHERE $eq)) AS BIGINT) AS n_orphan
FROM ($childSql) c"""
  }

  /** The UNION-ALL oracle over every relation, ordered by name. */
  def oracleSql(parts: Seq[String]): String =
    parts.mkString("", "\nUNION ALL\n", "\nORDER BY relation")
}
