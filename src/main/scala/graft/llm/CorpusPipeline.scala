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

  /** DuckDB oracle: the same three stages in SQL, built from the SAME
    * marker/stopword constants as the Column code.
    */
  def cleanOracle(table: String, idCol: String = "doc_id", textCol: String = "text",
                  keepCols: Seq[String] = Seq("doc_id", "lang", "n_chars"),
                  langKeep: String = "en", minTokens: Int = 20,
                  maxStopRatio: Double = 1.0): String = {
    def sqlList(words: Seq[String]) = words.map(w => s"'$w'").mkString(",")
    val scores = LangOrder.map(l =>
      s"len(list_filter(t, x -> x IN (${sqlList(LangMarkers(l))}))) AS s_$l").mkString(", ")
    val cases = LangOrder.map(l => s"WHEN mx > 0 AND s_$l = mx THEN '$l'").mkString(" ")
    s"""WITH toks AS (SELECT *, string_split($textCol, ' ') AS t FROM $table),
       |sc AS (SELECT *, $scores FROM toks),
       |m AS (SELECT *, greatest(${LangOrder.map("s_" + _).mkString(",")}) AS mx FROM sc),
       |lp AS (SELECT *, CASE $cases ELSE 'und' END AS lang_pred FROM m),
       |gated AS (SELECT * FROM lp WHERE lang_pred = '$langKeep' AND len(t) >= $minTokens
       |  AND CAST(len(list_filter(t, x -> x IN (${sqlList(TextFunctions.Stopwords)}))) AS DOUBLE) / len(t) <= $maxStopRatio)
       |SELECT ${keepCols.mkString(", ")} FROM gated QUALIFY
       |  $idCol = min($idCol) OVER (PARTITION BY CAST(('0x'||substr(md5($textCol),1,15)) AS BIGINT))
       |ORDER BY $idCol""".stripMargin
  }
}
