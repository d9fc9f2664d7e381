package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-record survivorship — the step AFTER matching: linkage
  * ([[RecordLinkage]], [[SortedNeighborhood]]) and clustering decide
  * which records are the same entity; survivorship decides what the ONE
  * merged record says. Master-data consolidation, CRM dedup output, the
  * "best view" table a warehouse publishes.
  *
  * Election rule, per attribute independently: prefer a NON-NULL value,
  * then the highest `recencyCol` (freshest source wins), then the lowest
  * `idCol` (total order — ties are impossible, so the merge is
  * deterministic and replay-stable). A cluster whose every value is NULL
  * for an attribute elects NULL, faithfully — survivorship fills from
  * sources, it does not fabricate.
  *
  * Shape: ONE partial-agg'd groupBy over the cluster key; each attribute
  * rides a `max(struct(present, recency, −id, value))` whose comparison
  * never reaches `value` (−id is unique), so the aggregate is a
  * fixed-width semilattice fold — map-side combine collapses a whale
  * cluster (the million-row entity) before any shuffle, the same posture
  * as `dedupExact`'s keeper. No window, no per-cluster sort, no
  * self-join.
  *
  * Contracts: `idCol` non-null unique integral; `recencyCol` integral
  * (cast to long); NULL cluster keys form their own cluster (groupBy
  * semantics — un-clustered records still consolidate).
  */
object Survivorship {

  /** One golden row per cluster: (clusterCol, n_records, attrs...*) with
    * each attribute elected independently by (non-null, recency desc,
    * id asc).
    */
  def goldenRecords(df: DataFrame, clusterCol: String, idCol: String,
                    recencyCol: String, attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "attrs must be non-empty")
    val integral = Set("integer", "bigint", "smallint", "tinyint")
    val idType = df.schema(idCol).dataType.simpleString
    require(integral(idType),
      s"idCol '$idCol' must be integral for the −id tiebreak, got $idType")
    val negId = -col(idCol).cast("long")
    val rec = col(recencyCol).cast("long")
    val elections = attrs.map { a =>
      max(struct(
        when(col(a).isNotNull, 1).otherwise(0).as("__p"),
        rec.as("__r"), negId.as("__n"), col(a).as("__v")))
        .getField("__v").as(a)
    }
    df.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_records"), elections: _*)
  }

  /** DuckDB replay of [[goldenRecords]] — one row_number election CTE
    * per attribute (engine-idiomatic; provably the same rule: non-null
    * first, recency desc, id asc), joined back on the cluster key.
    */
  def oracleSql(table: String, clusterCol: String, idCol: String,
                recencyCol: String, attrs: Seq[String]): String = {
    val ctes = attrs.zipWithIndex.map { case (a, i) =>
      s"""e$i AS (
  SELECT $clusterCol AS k, $a AS v FROM (
    SELECT $clusterCol, $a, row_number() OVER (PARTITION BY $clusterCol
      ORDER BY ($a IS NOT NULL) DESC, $recencyCol DESC, $idCol ASC) AS rn
    FROM $table) WHERE rn = 1)"""
    }
    val joins = attrs.indices
      .map(i => s"JOIN e$i ON base.k = e$i.k OR (base.k IS NULL AND e$i.k IS NULL)")
      .mkString("\n")
    val cols = attrs.zipWithIndex
      .map { case (a, i) => s"e$i.v AS $a" }.mkString(", ")
    s"""WITH base AS (
  SELECT $clusterCol AS k, CAST(count(*) AS BIGINT) AS n_records
  FROM $table GROUP BY 1),
${ctes.mkString(",\n")}
SELECT base.k AS $clusterCol, base.n_records, $cols
FROM base
$joins
ORDER BY base.k""".stripMargin
  }
}
