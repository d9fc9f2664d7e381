package graft.llm

import graft.text.TextFunctions
import graft.text.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-corpus cleaning flow — language gate → quality
  * gate → exact dedup — as ONE lazily-fused plan. Each stage is an existing
  * gate-checked operator; composing them costs nothing extra at scale:
  * the filters are codegen'd Column predicates evaluated in the scan stage
  * (documents failing the language/quality gates never reach the shuffle),
  * and the only exchange in the whole pipeline is exact-dedup's single
  * fingerprint shuffle of the SURVIVORS.
  */
object CorpusPipeline {

  /** @param langKeep   keep documents language-identified as this
    * @param minTokens  whitespace-token floor (too-short docs)
    * @param maxStopRatio stopword-ratio ceiling (boilerplate/listy docs have
    *   ratios near 0 or 1; real prose sits between — cap catches neither-NL
    *   token soup). Pass 1.0 to disable.
    */
  def clean(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
            langKeep: String = "en", minTokens: Int = 20,
            maxStopRatio: Double = 1.0): DataFrame = {
    val t = col(textCol)
    val gated = docs.where(
      langId(t) === langKeep &&
        nTokens(t) >= minTokens &&
        stopwordRatio(t) <= maxStopRatio)
    Dedup.dedupExact(gated, textCol, idCol)
  }

  /** CTE chain (no leading WITH) ending in relation `cleaned` — the
    * lang+quality+dedup stages as a composable fragment.
    */
  def cleanCtes(table: String, idCol: String = "doc_id", textCol: String = "text",
                langKeep: String = "en", minTokens: Int = 20,
                maxStopRatio: Double = 1.0): String = {
    val stopRatio =
      s"CAST(len(list_filter(t, x -> x IN (${TextFunctions.sqlList(TextFunctions.Stopwords)}))) AS DOUBLE) / len(t)"
    s"""${TextFunctions.langPredCtes(table, textCol, "*")},
       |gated AS (SELECT * FROM lp WHERE lang_pred = '$langKeep' AND len(t) >= $minTokens
       |  AND $stopRatio <= $maxStopRatio),
       |cleaned AS (SELECT * FROM gated QUALIFY
       |  $idCol = min($idCol) OVER (PARTITION BY CAST(('0x'||substr(md5($textCol),1,15)) AS BIGINT)))""".stripMargin
  }

  /** DuckDB oracle: the same three stages in SQL. The lang-id CTE chain
    * comes from [[TextFunctions.langPredCtes]] — the ONE place that SQL
    * shape lives (same for the marker/stopword constants), so this oracle
    * cannot drift from `q_lang_id`'s.
    */
  def cleanOracle(table: String, idCol: String = "doc_id", textCol: String = "text",
                  keepCols: Seq[String] = Seq("doc_id", "lang", "n_chars"),
                  langKeep: String = "en", minTokens: Int = 20,
                  maxStopRatio: Double = 1.0): String =
    s"""${cleanCtes(table, idCol, textCol, langKeep, minTokens, maxStopRatio)}
SELECT ${keepCols.mkString(", ")} FROM cleaned ORDER BY $idCol""".stripMargin

  /** End-to-end corpus preparation: benchmark decontamination → clean
    * (lang gate → quality gate → exact dedup) → deterministic stratified
    * sampling, composed as ONE lazily-fused plan.
    *
    * Decontamination runs FIRST. Semantically the order is neutral for
    * EXACT dedup (contamination is text-determined, so a duplicate group is
    * uniformly contaminated or uniformly clean); the ordering is a pure
    * plan win: the dirty-id derivation reads the RAW scan (explode →
    * broadcast gram match — zero corpus shuffle; only MATCHED gram rows
    * enter its tiny count shuffle) instead of re-deriving the cleaned
    * corpus — which would repeat the dedup shuffle. The full pipeline
    * costs exactly one corpus-width shuffle (exact-dedup's fingerprint
    * exchange over gate survivors); the gates and the sampling predicate
    * are codegen'd scan-stage filters throughout.
    */
  def prepare(docs: DataFrame, bench: DataFrame,
              textCol: String = "text", idCol: String = "doc_id",
              strataCol: String = "lang",
              rates: Seq[(String, Int)] = Seq("en" -> 70), defaultPct: Int = 10,
              decontaminateN: Int = 5): DataFrame = {
    val decon = Decontaminate.clean(docs, idCol, textCol, bench, n = decontaminateN)
    val cleaned = clean(decon, textCol, idCol)
    graft.text.CorpusFilters.stratifiedSample(
      cleaned, key = col(textCol), strata = col(strataCol), rates, defaultPct)
  }

  /** Oracle for [[prepare]] with the benchmark as a filtered subset of the
    * table — the three stage fragments chained through one WITH clause.
    */
  def prepareOracle(table: String, benchWhereSql: String,
                    idCol: String = "doc_id", textCol: String = "text",
                    keepCols: Seq[String] = Seq("doc_id", "lang", "n_chars"),
                    strataCol: String = "lang",
                    rates: Seq[(String, Int)] = Seq("en" -> 70), defaultPct: Int = 10,
                    decontaminateN: Int = 5): String =
    s"""WITH ${Decontaminate.overlapCtes(table, idCol, textCol, table, benchWhereSql, decontaminateN)},
decon AS (SELECT * FROM $table
  WHERE $idCol NOT IN (SELECT doc_id_ FROM ov WHERE n_overlap >= 1)),
${cleanCtes("decon", idCol, textCol).stripPrefix("WITH ")}
SELECT ${keepCols.mkString(", ")} FROM cleaned
WHERE ${graft.text.CorpusFilters.stratifiedKeepSql(textCol, strataCol, rates, defaultPct)}
ORDER BY $idCol""".stripMargin
}
