package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-explosion guard — estimate an equi-join's EXACT output size from
  * per-key counts before running it, and fail fast (with the offending
  * keys) when it exceeds a budget. The production mishap this prevents is
  * mundane and expensive: a dimension table that silently picked up
  * duplicate keys turns a 10⁹-row fact join into 10¹²+ output rows, and
  * the job discovers it only by dying hours in (or worse, by writing the
  * garbage). The guard turns that into an immediate, attributed error.
  *
  * Exactness: for an inner equi-join, |output| = Σ_key nₗ(key)·nᵣ(key) —
  * not an estimate. Computing it costs two partial-agg'd count
  * aggregates (shuffle = distinct keys, not rows) and a key-sized join —
  * negligible next to the join being guarded, and the aggregates' scans
  * typically come from cache/files the join reads anyway.
  *
  * Scale shape: all pre-checks are decomposable aggregates; the only
  * driver materialization is the single summary row plus the top-`show`
  * offending keys (bounded). The guarded join itself is whatever Spark
  * would have planned — the guard adds no hint and changes no semantics.
  */
object GuardedJoin {

  /** Thrown when the exact inner-join output size exceeds the budget. */
  final class JoinBudgetExceeded(msg: String) extends IllegalStateException(msg)

  /** Inner equi-join on `keys`, or [[JoinBudgetExceeded]] if the exact
    * output row count would exceed `maxOutputRows`. The error names the
    * `show` worst keys by per-key output contribution.
    */
  def inner(left: DataFrame, right: DataFrame, keys: Seq[String],
            maxOutputRows: Long, show: Int = 5): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(maxOutputRows > 0, s"maxOutputRows must be positive, got $maxOutputRows")
    val kc = keys.map(col)
    // DECIMAL(38,0) throughout: the guard exists precisely for the regime
    // where nl*nr (or their sum) overflows a Long — 3e9×3e9 per key wraps
    // silently without ANSI mode and throws past the JoinBudgetExceeded
    // contract with it; decimal stays exact to 10^38
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val lc = left.groupBy(kc: _*).agg(count(lit(1)).cast(dec).as("__nl"))
    val rc = right.groupBy(kc: _*).agg(count(lit(1)).cast(dec).as("__nr"))
    val perKey = lc.join(rc, keys).select(
      kc :+ (col("__nl") * col("__nr")).cast(dec).as("__out"): _*)
    val total = perKey.agg(sum("__out").cast(dec)).head()
    val totalRows = if (total.isNullAt(0)) BigDecimal(0)
      else BigDecimal(total.getDecimal(0))
    if (totalRows > BigDecimal(maxOutputRows)) {
      val worst = perKey.orderBy(col("__out").desc)
        .limit(show).collect()
        .map(r => keys.map(r.getAs[Any]).mkString("(", ",", ")") +
          "→" + r.getAs[java.math.BigDecimal]("__out").toBigInteger)
        .mkString(", ")
      throw new JoinBudgetExceeded(
        s"inner join on ${keys.mkString(",")} would produce ${totalRows.toBigInt} rows " +
          s"(budget $maxOutputRows); worst keys: $worst")
    }
    left.join(right, keys)
  }

  /** The sketch tier of the same question: estimate the inner-join output
    * size from two one-pass Count-Min sketches instead of the exact
    * key-sized pre-join — an upper bound (within ε·N_l·N_r whp), for when
    * even [[inner]]'s exact pre-check is too heavy or the sides are
    * sketched once and asked about many joins. Returns a 1-row frame
    * (`est_rows` BIGINT).
    */
  def estimateInnerRows(left: DataFrame, right: DataFrame, keyCol: String,
                        depth: Int = 4, width: Int = 256): DataFrame = {
    import graft.functions.CountMinSketch
    def sketch(df: DataFrame, out: String) = df.agg(
      CountMinSketch(depth, width)(
        CountMinSketch.buckets(col(keyCol).cast("string"), depth, width)).as(out))
    sketch(left, "__sl").crossJoin(sketch(right, "__sr"))
      .select(CountMinSketch.innerProduct(col("__sl"), col("__sr"), depth, width)
        .as("est_rows"))
  }

  /** DuckDB replay of [[estimateInnerRows]] — per-side true counts routed
    * through the same md5 cell arithmetic, Σ products per depth, min.
    * Exact for ANY collision pattern (it rebuilds the sketches, not the
    * true join size).
    */
  def estimateOracleSql(leftTable: String, rightTable: String, keyCol: String,
                        depth: Int = 4, width: Int = 256): String = {
    def side(tag: String, table: String): String = {
      val buckets = (0 until depth)
        .map(d => s"CAST(('0x'||substr(md5('cms$d:'||CAST($keyCol AS VARCHAR)),1,15)) AS BIGINT) % $width AS b$d")
        .mkString(", ")
      s"""c$tag AS (SELECT $keyCol, count(*) AS cnt FROM $table
  WHERE $keyCol IS NOT NULL GROUP BY $keyCol),
bk$tag AS (SELECT cnt, $buckets FROM c$tag)"""
    }
    val cells = (0 until depth).flatMap(d => Seq(
      s"pa$d AS (SELECT b$d AS cell, CAST(sum(cnt) AS BIGINT) AS t FROM bka GROUP BY 1)",
      s"pb$d AS (SELECT b$d AS cell, CAST(sum(cnt) AS BIGINT) AS t FROM bkb GROUP BY 1)"))
      .mkString(",\n")
    val prods = (0 until depth)
      .map(d => s"(SELECT coalesce(sum(pa$d.t * pb$d.t), 0) FROM pa$d JOIN pb$d USING (cell))")
      .mkString(", ")
    s"""WITH ${side("a", leftTable)},
${side("b", rightTable)},
$cells
SELECT CAST(least($prods) AS BIGINT) AS est_rows""".stripMargin
  }
}
