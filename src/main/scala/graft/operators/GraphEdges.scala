package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The undirected-graph canonicalization shared by the iterating graph
  * operators ([[KCore]], [[BfsHops]]): symmetrize, drop self-loops and
  * NULL endpoints, deduplicate, checkpoint lazily (the first consuming
  * job materializes the edge set; later rounds re-read the blocks). ONE definition on each side of the oracle so
  * the graph semantics cannot drift between operators.
  */
private[operators] object GraphEdges {

  /** Directed (__s, __d) edge list containing both orientations of every
    * undirected input edge.
    */
  def symmetrize(edges: DataFrame, srcCol: String,
                 dstCol: String): DataFrame = {
    val base = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
    base
      .unionAll(base.select(col("__d").as("__s"), col("__s").as("__d")))
      .distinct()
      // LAZY: the first consumer's job materializes the blocks; every
      // later round re-reads them — same single evaluation as the eager
      // form without the extra blocking setup job
      .localCheckpoint(false)
  }

  /** The DuckDB replica as a MATERIALIZED CTE named `name`, yielding
    * (s, d). MATERIALIZED matters: the iterating oracles reference each
    * round's CTE several times and a plain CTE would re-expand
    * exponentially.
    */
  def symmetrizeCteSql(name: String, edgesSql: String): String =
    s"""$name AS MATERIALIZED (
  SELECT DISTINCT s, d FROM (
    SELECT src AS s, dst AS d FROM ($edgesSql)
    WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
    UNION ALL
    SELECT dst AS s, src AS d FROM ($edgesSql)
    WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst))"""
}
