package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FIFO lot matching — allocate consumption against acquisition lots in
  * first-in-first-out order per key: COGS / revenue-recognition lot
  * accounting ("which purchase lots did this shipment consume, at what
  * quantities"), inventory ageing, and queue-draining audits. The
  * textbook formulation is a sequential walk; the DISTRIBUTED one is an
  * interval intersection on CUMULATIVE mass: lot i owns the mass range
  * [Σq<i, Σq≤i) and demand j consumes [Σq<j, Σq≤j), so the allocation of
  * lot i to demand j is exactly the overlap of the two ranges — no walk,
  * no state, pure arithmetic, and provably ≤ lots+demands output rows
  * per key (every allocation exhausts a lot or a demand).
  *
  * Exact semantics: quantities are integral (the [[graft.Guards]] Drift
  * rule) and strictly positive — zero/negative raises in-plan (a
  * negative quantity silently corrupts every cumulative bound after it);
  * duplicate order indexes raise (FIFO needs a total order per key;
  * detected via `lag` on the SAME cumsum window). Unconsumed lot mass
  * and unfilled demand simply have no counterpart interval — the
  * [[unfilledDemand]] twin reports the latter explicitly. NULL
  * key/idx/qty rows drop (declared — a lot outside any key has no
  * queue).
  *
  * Scale shape: per side one per-key cumsum window (lots-per-key
  * bounded by contract — these are purchase orders, not events), then
  * the pairing is the [[RangeJoin.overlapJoin]] mass-bucket encoding:
  * explode each interval over `bucketMass`-wide cells of the cumulative
  * axis, equi-join on (key, cell), keep each pair only in its first
  * joint cell (exactly-once by arithmetic), residual-filter true
  * overlap. No per-key quadratic pairing anywhere. A single interval
  * wider than `maxCellsPerRow` cells raises loudly before it can
  * explode a partition (corrupt-quantity guard).
  */
object FifoMatch {

  /** Allocation rows: (keyCol, lot_idx, demand_idx, qty), qty > 0.
    *
    * @param bucketMass cell width on the cumulative-mass axis — choose
    *                   near the typical lot/demand quantity so each row
    *                   covers O(1) cells
    */
  def allocate(lots: DataFrame, demands: DataFrame, keyCol: String,
               idxCol: String, qtyCol: String,
               bucketMass: Long = 256L,
               maxCellsPerRow: Long = 4096L): DataFrame = {
    require(bucketMass >= 1, s"bucketMass must be >= 1, got $bucketMass")
    require(maxCellsPerRow >= 2, s"maxCellsPerRow must be >= 2, got $maxCellsPerRow")
    val l = cumIntervals(lots, keyCol, idxCol, qtyCol, "l",
      bucketMass, maxCellsPerRow)
    val d = cumIntervals(demands, keyCol, idxCol, qtyCol, "d",
      bucketMass, maxCellsPerRow)
    val overlap = col("__ls") < col("__de") && col("__ds") < col("__le")
    val firstJoint = greatest(
      cellOf(col("__ls"), bucketMass), cellOf(col("__ds"), bucketMass))
    l.join(d,
        col("__lk") === col("__dk") && col("__lcell") === col("__dcell") &&
          overlap && col("__lcell") === firstJoint)
      .select(col("__lk").as(keyCol),
        col("__li").as("lot_idx"),
        col("__di").as("demand_idx"),
        (least(col("__le"), col("__de")) -
          greatest(col("__ls"), col("__ds"))).as("qty"))
  }

  /** Per-demand unfilled remainder: (keyCol, demand_idx, qty_demanded,
    * qty_unfilled) for demands not fully covered by the key's total lot
    * mass (qty_unfilled > 0 rows only). Same guards as [[allocate]].
    */
  def unfilledDemand(lots: DataFrame, demands: DataFrame, keyCol: String,
                     idxCol: String, qtyCol: String): DataFrame = {
    val d = cumRaw(demands, keyCol, idxCol, qtyCol)
    val supply = cumRaw(lots, keyCol, idxCol, qtyCol)
      .groupBy(col("__k")).agg(max(col("__e")).as("__supply"))
    d.join(supply, Seq("__k"), "left")
      .withColumn("__s0", coalesce(col("__supply"), lit(0L)))
      .where(col("__e") > col("__s0"))
      .select(col("__k").as(keyCol), col("__i").as("demand_idx"),
        col("__q").as("qty_demanded"),
        (col("__e") - greatest(col("__e") - col("__q"), col("__s0")))
          .as("qty_unfilled"))
  }

  /** Per-lot unconsumed remainder — the inventory-AGEING readout (which
    * lots still sit on the shelf, and how much of each): mirror of
    * [[unfilledDemand]] — a lot's remaining mass is its interval minus
    * the key's total demand, `max(0, lot_end − max(lot_start, D))`.
    * Rows with qty_remaining > 0 only; same guards as [[allocate]].
    */
  def remainingLots(lots: DataFrame, demands: DataFrame, keyCol: String,
                    idxCol: String, qtyCol: String): DataFrame = {
    val l = cumRaw(lots, keyCol, idxCol, qtyCol)
    val demand = cumRaw(demands, keyCol, idxCol, qtyCol)
      .groupBy(col("__k")).agg(max(col("__e")).as("__demand"))
    l.join(demand, Seq("__k"), "left")
      .withColumn("__d0", coalesce(col("__demand"), lit(0L)))
      .where(col("__e") > col("__d0"))
      .select(col("__k").as(keyCol), col("__i").as("lot_idx"),
        col("__q").as("qty_lot"),
        (col("__e") - greatest(col("__e") - col("__q"), col("__d0")))
          .as("qty_remaining"))
  }

  private def cellOf(mass: Column, bucketMass: Long): Column =
    call_function("div", mass, lit(bucketMass))

  /** (key, idx, qty, end-cum) with the in-plan qty/dup raises wired. */
  private def cumRaw(df: DataFrame, keyCol: String, idxCol: String,
                     qtyCol: String): DataFrame = {
    graft.Guards.requireIntegral(df, idxCol, "fifo")
    graft.Guards.requireIntegral(df, qtyCol, "fifo")
    val w = Window.partitionBy(col("__k")).orderBy(col("__i"))
    df.where(col(keyCol).isNotNull && col(idxCol).isNotNull &&
        col(qtyCol).isNotNull)
      .select(col(keyCol).as("__k"), col(idxCol).cast("long").as("__i"),
        col(qtyCol).cast("long").as("__q"))
      .withColumn("__q",
        when(col("__q") <= 0, raise_error(concat(
          lit("fifo: non-positive quantity at idx "),
          col("__i").cast("string"), lit(" in key '"),
          col("__k").cast("string"),
          lit("' — it would corrupt every cumulative bound after it")))
          .cast("long"))
          .otherwise(col("__q")))
      .withColumn("__dupRaise",
        when(lag(col("__i"), 1).over(w) === col("__i"), raise_error(concat(
          lit("fifo: duplicate idx "), col("__i").cast("string"),
          lit(" in key '"), col("__k").cast("string"),
          lit("' — FIFO needs a total order; disambiguate the index")))
          .cast("long")).otherwise(lit(0L)))
      .withColumn("__e",
        sum(col("__q")).over(w.rowsBetween(Window.unboundedPreceding, 0)) +
          col("__dupRaise"))
      .drop("__dupRaise")
  }

  private def cumIntervals(df: DataFrame, keyCol: String, idxCol: String,
                           qtyCol: String, side: String, bucketMass: Long,
                           maxCellsPerRow: Long): DataFrame = {
    val c = cumRaw(df, keyCol, idxCol, qtyCol)
      .withColumn("__s", col("__e") - col("__q"))
    val cells = cellOf(col("__e") - 1, bucketMass) -
      cellOf(col("__s"), bucketMass) + 1
    c.withColumn("__cell",
        explode(sequence(
          when(cells > maxCellsPerRow, raise_error(concat(
            lit(s"fifo: one interval covers more than $maxCellsPerRow cells "),
            lit("(qty "), col("__q").cast("string"), lit(" at idx "),
            col("__i").cast("string"),
            lit(s") — raise bucketMass or fix the quantity")))
            .cast("long"))
            .otherwise(cellOf(col("__s"), bucketMass)),
          cellOf(col("__e") - 1, bucketMass))))
      .select(col("__k").as(s"__${side}k"), col("__i").as(s"__${side}i"),
        col("__s").as(s"__${side}s"), col("__e").as(s"__${side}e"),
        col("__cell").as(s"__${side}cell"))
  }

  /** DuckDB replay of [[allocate]] — plain cumsum CTEs + inequality
    * join (band-free; result-equal). `lotsSql`/`demandsSql` yield
    * (k, i, q).
    */
  def allocateOracle(lotsSql: String, demandsSql: String,
                     keyName: String): String =
    s"""WITH lc AS (SELECT k, i, q,
    sum(q) OVER (PARTITION BY k ORDER BY i ROWS UNBOUNDED PRECEDING) AS e
  FROM ($lotsSql) WHERE k IS NOT NULL AND i IS NOT NULL AND q IS NOT NULL),
dc AS (SELECT k, i, q,
    sum(q) OVER (PARTITION BY k ORDER BY i ROWS UNBOUNDED PRECEDING) AS e
  FROM ($demandsSql) WHERE k IS NOT NULL AND i IS NOT NULL AND q IS NOT NULL)
SELECT lc.k AS $keyName, lc.i AS lot_idx, dc.i AS demand_idx,
  CAST(least(lc.e, dc.e) - greatest(lc.e - lc.q, dc.e - dc.q) AS BIGINT) AS qty
FROM lc JOIN dc ON lc.k = dc.k
  AND lc.e - lc.q < dc.e AND dc.e - dc.q < lc.e"""
}
