package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
import org.apache.spark.storage.StorageLevel

/** Token-budget corpus selection: keep the best-scoring documents until a
  * global token budget is filled — the data-mixing step that follows
  * quality scoring ("train on the most natural 50 B tokens", a fixed-size
  * high-quality cut of a larger corpus). Composes with
  * [[UnigramLm]] (rank by quantized mean NLL) or any integral quality
  * score; a document is kept iff the running token total through it — in
  * (score asc, id asc) total order — is within the budget, so the cut is
  * deterministic and engine-replayable.
  *
  * Scale shape (100 TB): the naive form is `sum(tokens) OVER (ORDER BY
  * score, id)` — a total-order window that funnels the corpus into ONE
  * task. This is the [[Packing]] two-level prefix sum instead, with the
  * coarse level derived from the SCORE VALUE (bucket = score div
  * `bucketWidth` — monotone, so buckets are contiguous runs of the total
  * order): per-bucket cumsums run parallel (spill-backed external sort per
  * bucket), bucket totals (~score-range/width rows) prefix-sum in one tiny
  * task, offsets broadcast-join back. The 4-long-column projection feeding
  * both branches of that self-join is persisted (MEMORY_AND_DISK;
  * reclaimed by the ContextCleaner once unreferenced) so the upstream —
  * for [[selectByLmScore]], the whole LM scoring job — evaluates once, and
  * the corpus crosses the wire once. The result is bucketing-independent
  * by the prefix-sum algebra (the spec proves it).
  *
  * A score distribution concentrated in few buckets degrades to wall-clock
  * skew (one bucket's external sort), never memory blowup — pick
  * `bucketWidth` so the expected per-bucket mass is partition-sized. The
  * score must be integral (the [[graft.operators.Drift]] rule: fractional
  * scores would bucket/truncate differently across engines — scale to
  * integer units first, e.g. milli-nats per token).
  *
  * Contracts shared by both entry points:
  *  - rows with a NULL id, score, or group are EXCLUDED from selection
  *    (they have no place in the total order; pre-clean with `coalesce`
  *    if they must count) — the oracles filter identically;
  *  - `idCol` must be unique per (group): the running sum uses an
  *    explicit ROWS frame, so duplicate (score, id) rows would be cut
  *    one-of-them-arbitrarily rather than both-or-neither.
  */
object BudgetSelect {

  private def requireIntegralScore(df: DataFrame, scoreCol: String, fn: String): Unit =
    df.schema(scoreCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"$fn needs an integral score column (scale fractional scores to " +
          s"integer units first); $scoreCol is ${other.catalogString}")
    }

  /** The shared two-level bounded prefix sum over (`grpCols`, score
    * bucket): per-bucket ROWS-frame cumsums in parallel, bucket totals
    * prefix-summed over the tiny aggregate frame, offsets broadcast back,
    * budget filter. `perDoc` must carry `__id`, `__score`, `n_tokens`,
    * `__bucket` (+ `grpCols`), already NULL-filtered.
    */
  private def boundedPrefixCut(perDoc: DataFrame, grpCols: Seq[String],
                               budget: Column): DataFrame = {
    val cached = perDoc.persist(StorageLevel.MEMORY_AND_DISK)
    val keyCols = grpCols :+ "__bucket"
    val withinW = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__score").asc, col("__id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = cached.withColumn("__cum", sum("n_tokens").over(withinW))
    val totalsBase =
      if (grpCols.isEmpty) Window.orderBy("__bucket")
      else Window.partitionBy(grpCols.map(col): _*).orderBy("__bucket")
    val totalsW = totalsBase.rowsBetween(Window.unboundedPreceding, -1)
    val offsets = cached.groupBy(keyCols.map(col): _*)
      .agg(sum("n_tokens").as("__btot"))
      .withColumn("__boff", coalesce(sum("__btot").over(totalsW), lit(0L)))
      .select((keyCols :+ "__boff").map(col): _*)
    within.join(broadcast(offsets), keyCols)
      .withColumn("cum_tokens", col("__boff") + col("__cum"))
      .where(col("cum_tokens") <= budget)
  }

  private def bucketCol(scoreCol: String, bucketWidth: Long): Column =
    floor(col(scoreCol).cast(LongType).cast("double") / lit(bucketWidth.toDouble))
      .cast(LongType)

  /** Documents within the budget: (`idCol`, `scoreCol`, n_tokens,
    * cum_tokens) for every document whose inclusive running token total in
    * (score asc, id asc) order is ≤ `budget`. `tokens` is the per-document
    * token count expression (e.g. [[TextFunctions.nTokens]]).
    */
  def selectWithinBudget(
      df: DataFrame, idCol: String, scoreCol: String, tokens: Column,
      budget: Long, bucketWidth: Long = 1000L): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireIntegralScore(df, scoreCol, "selectWithinBudget")
    val perDoc = df
      .where(col(idCol).isNotNull && col(scoreCol).isNotNull)
      .select(
        col(idCol).as("__id"),
        col(scoreCol).cast(LongType).as("__score"),
        tokens.cast(LongType).as("n_tokens"),
        bucketCol(scoreCol, bucketWidth).as("__bucket"))
    boundedPrefixCut(perDoc, Seq.empty, lit(budget))
      .select(col("__id").as(idCol), col("__score").as(scoreCol),
        col("n_tokens"), col("cum_tokens"))
  }

  /** Per-group token caps — "no domain may contribute more than `budget`
    * tokens" (the C4/RefinedWeb-style dominance cap, run before mixing):
    * within every `groupCol` value independently, keep the best-scoring
    * documents while the group's running token total fits. Same two-level
    * decomposition with the coarse level = (group, score bucket): row
    * windows and the within-group bucket-offset windows are all
    * partitioned — nothing global anywhere, whatever the group count. A
    * whale DOMAIN parallelizes across its score buckets; only the
    * bucket-totals frame (rows = occupied (group, bucket) pairs) funnels
    * per group, and that is corpus/bucket-mass sized, not row sized.
    */
  def capPerGroup(
      df: DataFrame, idCol: String, groupCol: String, scoreCol: String,
      tokens: Column, budget: Long, bucketWidth: Long = 1000L): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireIntegralScore(df, scoreCol, "capPerGroup")
    val perDoc = df
      .where(col(idCol).isNotNull && col(scoreCol).isNotNull &&
        col(groupCol).isNotNull)
      .select(
        col(idCol).as("__id"),
        col(groupCol).as("__grp"),
        col(scoreCol).cast(LongType).as("__score"),
        tokens.cast(LongType).as("n_tokens"),
        bucketCol(scoreCol, bucketWidth).as("__bucket"))
    boundedPrefixCut(perDoc, Seq("__grp"), lit(budget))
      .select(col("__id").as(idCol), col("__grp").as(groupCol),
        col("__score").as(scoreCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Weighted corpus mixing — the Pile/Dolma-style recipe step: split a
    * total token budget across domains by per-mille weights
    * (budget(d) = ⌊total·w(d)/1000⌋, integer arithmetic so the recipe is
    * engine-replayable), then apply the per-domain cut. Domains ABSENT
    * from `weightsPerMille` are excluded entirely (weight 0); weights
    * need not sum to 1000 (over/under-allocate deliberately). Chain
    * [[graft.operators.Interleave.byDomain]] on the result for the
    * clump-free training order. Same plan shape as [[capPerGroup]] —
    * the per-domain budget rides as a scan-stage literal-map lookup.
    */
  def mixByWeights(
      df: DataFrame, idCol: String, groupCol: String, scoreCol: String,
      tokens: Column, weightsPerMille: Map[String, Long], totalBudget: Long,
      bucketWidth: Long = 1000L): DataFrame = {
    require(totalBudget > 0, "totalBudget must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(weightsPerMille.nonEmpty, "weightsPerMille must be non-empty")
    require(weightsPerMille.values.forall(_ > 0),
      "weights must be positive (omit a domain to exclude it)")
    requireIntegralScore(df, scoreCol, "mixByWeights")
    val budgets = weightsPerMille.map { case (d, w) => d -> totalBudget * w / 1000L }
    require(budgets.values.forall(_ > 0),
      "every weighted domain must get a positive token budget — raise " +
        "totalBudget or the smallest weight")
    val budgetMap = map(budgets.toSeq.sortBy(_._1).flatMap {
      case (d, b) => Seq(lit(d), lit(b))
    }: _*)
    val perDoc = df
      .where(col(idCol).isNotNull && col(scoreCol).isNotNull &&
        col(groupCol).isin(budgets.keys.toSeq: _*))
      .select(
        col(idCol).as("__id"),
        col(groupCol).as("__grp"),
        col(scoreCol).cast(LongType).as("__score"),
        tokens.cast(LongType).as("n_tokens"),
        bucketCol(scoreCol, bucketWidth).as("__bucket"))
    boundedPrefixCut(perDoc, Seq("__grp"), element_at(budgetMap, col("__grp")))
      .select(col("__id").as(idCol), col("__grp").as(groupCol),
        col("__score").as(scoreCol), col("n_tokens"), col("cum_tokens"))
  }

  /** DuckDB replay of [[mixByWeights]]: same integer budget arithmetic as
    * a CASE over the weighted domains. `fromSql` yields (`idCol`,
    * `groupCol`, `scoreCol`, n_tokens).
    */
  def mixOracle(fromSql: String, idCol: String, groupCol: String,
                scoreCol: String, weightsPerMille: Map[String, Long],
                totalBudget: Long): String = {
    val budgets = weightsPerMille.toSeq.sortBy(_._1)
      .map { case (d, w) => d -> totalBudget * w / 1000L }
    def q(d: String): String = "'" + d.replace("'", "''") + "'"
    val inList = budgets.map { case (d, _) => q(d) }.mkString(", ")
    val cases = budgets.map { case (d, b) => s"WHEN ${q(d)} THEN $b" }.mkString(" ")
    s"""WITH cum AS (SELECT $idCol, $groupCol, $scoreCol, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY $groupCol
       |      ORDER BY $scoreCol, $idCol ROWS UNBOUNDED PRECEDING) AS cum_tokens
       |  FROM ($fromSql)
       |  WHERE $idCol IS NOT NULL AND $scoreCol IS NOT NULL
       |    AND $groupCol IN ($inList))
       |SELECT $idCol, $groupCol, $scoreCol,
       |  CAST(n_tokens AS BIGINT) AS n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
       |FROM cum WHERE cum_tokens <= CASE $groupCol $cases END
       |ORDER BY $idCol""".stripMargin
  }

  /** DuckDB replay of [[capPerGroup]] (integral score already on the
    * table): per-group total-order running sum with the same NULL
    * exclusions. `fromSql` is a subquery yielding (`idCol`, `groupCol`,
    * `scoreCol`, n_tokens).
    */
  def capPerGroupOracle(fromSql: String, idCol: String, groupCol: String,
                        scoreCol: String, budget: Long): String =
    s"""WITH cum AS (SELECT $idCol, $groupCol, $scoreCol, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY $groupCol
       |      ORDER BY $scoreCol, $idCol ROWS UNBOUNDED PRECEDING) AS cum_tokens
       |  FROM ($fromSql)
       |  WHERE $idCol IS NOT NULL AND $scoreCol IS NOT NULL
       |    AND $groupCol IS NOT NULL)
       |SELECT $idCol, $groupCol, $scoreCol,
       |  CAST(n_tokens AS BIGINT) AS n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
       |FROM cum WHERE cum_tokens <= $budget
       |ORDER BY $idCol""".stripMargin

  /** [[UnigramLm]] composition: score the corpus against itself (top-V
    * vocab), rank by integral milli-nats per token
    * (⌊1000·nll_q/n_tokens⌋ — mean NLL, so length doesn't bias the cut),
    * keep the most natural documents within the token budget.
    */
  def selectByLmScore(docs: DataFrame, vocabSize: Int, budget: Long,
                      idCol: String = "doc_id", textCol: String = "text",
                      bucketWidth: Long = 1000L): DataFrame = {
    val scored = UnigramLm.scoreSelf(docs, vocabSize, idCol, textCol)
      .withColumn("mean_nll_mq",
        floor(col("nll_q").cast("double") * 1000.0 / col("n_tokens").cast("double"))
          .cast(LongType))
      .select(col(idCol), col("mean_nll_mq"), col("n_tokens").as("__nt"))
    selectWithinBudget(scored, idCol, "mean_nll_mq", col("__nt"), budget, bucketWidth)
  }

  /** DuckDB replay of [[selectByLmScore]] — the two-level prefix sum is
    * algebraically the plain total-order running sum, so the oracle uses
    * the direct window form over the [[UnigramLm.oracleSql]] CTE chain;
    * the gate thereby proves the decomposition.
    */
  def lmOracleSql(table: String, vocabSize: Int, budget: Long,
                  idCol: String = "doc_id", textCol: String = "text"): String =
    s"""WITH lm AS (${UnigramLm.oracleSql(table, vocabSize, idCol, textCol)}),
       |scored AS (SELECT $idCol,
       |    CAST(floor(CAST(nll_q AS DOUBLE) * 1000.0 / CAST(n_tokens AS DOUBLE)) AS BIGINT)
       |      AS mean_nll_mq,
       |    n_tokens
       |  FROM lm),
       |cum AS (SELECT $idCol, mean_nll_mq, n_tokens,
       |    sum(n_tokens) OVER (ORDER BY mean_nll_mq, $idCol ROWS UNBOUNDED PRECEDING)
       |      AS cum_tokens
       |  FROM scored)
       |SELECT $idCol, mean_nll_mq, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(cum_tokens AS BIGINT) AS cum_tokens
       |FROM cum WHERE cum_tokens <= $budget
       |ORDER BY $idCol""".stripMargin
}
