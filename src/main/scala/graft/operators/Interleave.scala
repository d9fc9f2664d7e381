package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic domain-interleaved ordering — assign every row its
  * position in the round-robin merge of per-domain queues (domain A row 1,
  * domain B row 1, …, domain A row 2, …), the training-order layout that
  * keeps a mixed corpus from clumping one domain into long runs (batches
  * see every domain at its mixing ratio, not whichever shard came next).
  * Domains exhaust gracefully: once a domain runs out, the remaining
  * domains keep cycling.
  *
  * The naive formulation is `row_number() OVER (ORDER BY rank, domain)` —
  * a global total-order window, ONE task at 100 TB. This computes the same
  * position ARITHMETICALLY: interleave_pos of (rank r, domain d) in the
  * lexicographic (r, d) order restricted to live pairs is
  *
  *   1 + Σ_{d'} min(r−1, size(d'))            (pairs with smaller rank)
  *     + #{d' < d : size(d') ≥ r}             (same rank, earlier domain)
  *
  * so the whole layout costs ONE partitioned window (per-domain ranks) +
  * a domain-count aggregate collected to the driver (bounded — domains
  * are languages/sources/datasets, not rows) shipped back as a literal
  * array evaluated in the scan stage. No global sort, no second shuffle;
  * the gate proves the arithmetic against the window-form oracle.
  *
  * Contracts: the domain column must be a STRING (languages, sources,
  * dataset names — the native lexicographic order then agrees byte-wise
  * with the oracle; a non-string domain would interleave by its string
  * rendering, silently diverging from the window form); rows with a NULL
  * domain or a NULL order key are excluded; `orderCols` must totally
  * order rows within every domain (append a unique id as tie-break —
  * pass a fingerprint of the id for a deterministic shuffled curriculum
  * instead of id order). Domain count is guarded (default ≤ 1000: the
  * inventory is a per-row O(|domains|) literal-array fold, the right
  * shape for the languages/sources/datasets this orders — for a huge
  * domain space, interleave coarser units).
  */
object Interleave {

  /** (all input columns, `rank_in_domain`, `interleave_pos`), positions
    * 1..n dense over the non-excluded rows.
    */
  def byDomain(df: DataFrame, domainCol: String, orderCols: Seq[Column],
               maxDomains: Int = 1000): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(df.schema(domainCol).dataType == org.apache.spark.sql.types.StringType,
      s"byDomain needs a string domain column; $domainCol is " +
        df.schema(domainCol).dataType.catalogString)
    val clean = df.where(col(domainCol).isNotNull &&
      orderCols.map(_.isNotNull).reduce(_ && _))
    val rankW = Window.partitionBy(col(domainCol)).orderBy(orderCols: _*)
    // persisted across the inventory collect and the returned frame — the
    // upstream evaluates once, and the sizes the positions are computed
    // against are EXACTLY the ranks' run (a nondeterministic upstream
    // re-evaluated could disagree and break the dense-permutation
    // property); ContextCleaner reclaims the blocks once unreferenced
    val ranked = clean.withColumn("rank_in_domain",
        row_number().over(rankW).cast(LongType))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded domain inventory: one partial-agg'd count, driver literal
    val sizes = ranked.groupBy(col(domainCol).as("__d"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    require(sizes.length <= maxDomains,
      s"${sizes.length} domains exceed maxDomains=$maxDomains — interleave " +
        "coarser units or raise the cap")
    if (sizes.isEmpty) {
      // empty input (or all rows excluded): an empty literal array has no
      // struct type to fold over — return the empty frame directly
      return ranked.withColumn("interleave_pos", lit(0L)).where(lit(false))
    }
    val sizeArr = array(sizes.map { case (d, n) =>
      struct(lit(d).as("d"), lit(n).as("n"))
    }: _*)
    // Σ min(r−1, size) over all domains + same-rank earlier-domain count,
    // evaluated per row in the scan stage against the literal inventory
    val r = col("rank_in_domain")
    val pos = aggregate(sizeArr, lit(1L),
      (acc, e) => acc
        + least(r - 1L, e.getField("n"))
        + when(e.getField("d") < col(domainCol)
            && e.getField("n") >= r, 1L).otherwise(0L))
    ranked.withColumn("interleave_pos", pos)
  }

  /** DuckDB replay via the direct global window — same ranks, same
    * (rank, domain) lexicographic merge; proves the arithmetic. `fromSql`
    * yields (`idCol`, `domainCol`); rows ordered by `idCol` per domain.
    */
  def oracleSql(fromSql: String, idCol: String, domainCol: String): String =
    s"""WITH r AS (SELECT $idCol, $domainCol,
       |    CAST(row_number() OVER (PARTITION BY $domainCol ORDER BY $idCol) AS BIGINT)
       |      AS rank_in_domain
       |  FROM ($fromSql)
       |  WHERE $domainCol IS NOT NULL AND $idCol IS NOT NULL)
       |SELECT $idCol, $domainCol, rank_in_domain,
       |  CAST(row_number() OVER (ORDER BY rank_in_domain, $domainCol) AS BIGINT)
       |    AS interleave_pos
       |FROM r ORDER BY $idCol""".stripMargin
}
