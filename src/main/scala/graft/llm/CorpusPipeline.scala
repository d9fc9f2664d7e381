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

  /** DuckDB oracle: the same three stages in SQL. The lang-id CTE chain
    * comes from [[TextFunctions.langPredCtes]] — the ONE place that SQL
    * shape lives (same for the marker/stopword constants), so this oracle
    * cannot drift from `q_lang_id`'s.
    */
  def cleanOracle(table: String, idCol: String = "doc_id", textCol: String = "text",
                  keepCols: Seq[String] = Seq("doc_id", "lang", "n_chars"),
                  langKeep: String = "en", minTokens: Int = 20,
                  maxStopRatio: Double = 1.0): String = {
    val stopRatio =
      s"CAST(len(list_filter(t, x -> x IN (${TextFunctions.sqlList(TextFunctions.Stopwords)}))) AS DOUBLE) / len(t)"
    s"""${TextFunctions.langPredCtes(table, textCol, "*")},
       |gated AS (SELECT * FROM lp WHERE lang_pred = '$langKeep' AND len(t) >= $minTokens
       |  AND $stopRatio <= $maxStopRatio)
       |SELECT ${keepCols.mkString(", ")} FROM gated QUALIFY
       |  $idCol = min($idCol) OVER (PARTITION BY CAST(('0x'||substr(md5($textCol),1,15)) AS BIGINT))
       |ORDER BY $idCol""".stripMargin
  }
}
