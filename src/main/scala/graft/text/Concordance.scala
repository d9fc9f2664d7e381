package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KWIC concordance — every occurrence of a term with its ±window
  * token context, the corpus-inspection view lexicographers invented
  * and LLM-data debugging reinvented ("show me how this token is
  * actually used" before deciding a filter; auditing what surrounds a
  * PII hit or a contamination marker). [[PhraseSearch]] answers WHERE;
  * this answers WHAT IT LOOKS LIKE.
  *
  * Exact semantics: whitespace tokens (the repo convention), 1-based
  * hit positions, contexts are the space-joined tokens in
  * [pos−window, pos) and (pos, pos+window] clipped at the document
  * edges (a hit at position 1 has an empty left context — the honest
  * edge, spec-pinned). Case-sensitive exact term match (fold upstream
  * if wanted — silently folding would lie about the corpus).
  *
  * Scale shape: one posexplode whose term filter fuses into the SAME
  * scan stage (no shuffle — the row explosion never materializes past
  * the filter), then slice/concat_ws on the carried token array;
  * output is hit-sized. No joins, no windows.
  */
object Concordance {

  /** (doc_id, pos, left_ctx, right_ctx). */
  def kwic(docs: DataFrame, idCol: String, textCol: String, term: String,
           window: Int): DataFrame = {
    require(term.nonEmpty && !term.contains(" "),
      s"term must be one non-empty token, got '$term'")
    require(window >= 1, s"window must be positive, got $window")
    docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__t"))
      .select(col("doc_id"), col("__t"),
        posexplode(col("__t")).as(Seq("__p0", "__tok")))
      .where(col("__tok") === term)
      .select(col("doc_id"), (col("__p0") + 1).cast("long").as("pos"),
        concat_ws(" ", slice(col("__t"),
          greatest(col("__p0") - window + 1, lit(1)),
          least(col("__p0"), lit(window)))).as("left_ctx"),
        concat_ws(" ", slice(col("__t"), col("__p0") + 2,
          lit(window))).as("right_ctx"))
  }

  /** DuckDB replay over the same whitespace tokens. */
  def oracleSql(table: String, idCol: String, textCol: String,
                term: String, window: Int): String = {
    val t = term.replace("'", "''")
    s"""SELECT doc_id, CAST(i AS BIGINT) AS pos,
  coalesce(array_to_string(t[greatest(i - $window, 1):i - 1], ' '), '')
    AS left_ctx,
  coalesce(array_to_string(t[i + 1:least(i + $window, len(t))], ' '), '')
    AS right_ctx
FROM (SELECT $idCol AS doc_id, string_split($textCol, ' ') AS t,
    unnest(list_filter(generate_series(1, len(string_split($textCol, ' '))),
      i -> string_split($textCol, ' ')[i] = '$t')) AS i
  FROM $table WHERE $idCol IS NOT NULL AND $textCol IS NOT NULL)
ORDER BY doc_id, pos"""
  }
}
