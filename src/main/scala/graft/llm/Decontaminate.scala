package graft.llm

import graft.text.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove (or flag) training documents that
  * overlap an evaluation/benchmark set by shared n-grams — the standard
  * test-set-contamination guard a training-data pipeline runs before any
  * model sees the corpus.
  *
  * Semantics: a corpus document is contaminated when at least `minOverlap`
  * of its DISTINCT n-gram hashes also appear in the benchmark's n-gram set.
  * Matching is by the engine-portable 60-bit md5 hash ([[hash60]]), and the
  * hash-join semantic (not raw-string equality) IS the contract on both
  * engines — so the DuckDB oracle replays bit-identical results.
  *
  * Scale shape (100 TB corpus, MB-scale benchmark): the benchmark gram set
  * is tiny relative to the corpus — it is distinct-reduced and BROADCAST, so
  * the corpus-side explode → hash → join all runs map-side in the scan
  * stage with zero corpus shuffle. Only MATCHED (doc, gram) rows — a
  * vanishing fraction — enter the per-doc count shuffle, and the flag joins
  * back to the corpus by broadcasting the (small) contaminated-id set, so
  * the full-width corpus rows never shuffle at all.
  *
  * Reference scope note: the fabrix reference has no corpus operators — this
  * is the LLM-pipeline extension surface (SURVEY §2.11) built on
  * [[graft.text.TextFunctions]].
  */
object Decontaminate {

  /** Distinct n-gram hash set of the benchmark corpus — one `gram_h` Long
    * column. Distinct-reduced before broadcast so the build side is minimal.
    */
  def benchmarkGrams(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench
      .select(explode(shingleSet(col(textCol), n)).as("g"))
      .select(hash60(col("g")).as("gram_h"))
      .distinct()

  /** Per-document overlap counts — only documents with ≥1 shared gram appear
    * (`idCol`, n_overlap). The corpus side never shuffles: the benchmark set
    * broadcasts and the join filters map-side.
    */
  def overlapCounts(
      corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, n: Int): DataFrame =
    corpus
      .select(col(idCol), explode(shingleSet(col(textCol), n)).as("g"))
      .select(col(idCol), hash60(col("g")).as("gram_h"))
      .join(broadcast(benchmarkGrams(bench, textCol, n)), "gram_h")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_overlap"))

  /** Corpus + (`n_overlap`, `contaminated`) columns. The overlap table holds
    * only contaminated docs (small), so it broadcasts back onto the corpus —
    * full-width corpus rows stay in place.
    */
  def flag(
      corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, n: Int = 5, minOverlap: Int = 1): DataFrame =
    corpus
      .join(broadcast(overlapCounts(corpus, idCol, textCol, bench, n)), Seq(idCol), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)

  /** Decontaminated corpus: drop every flagged document (broadcast anti-join
    * on the small contaminated-id set).
    */
  def clean(
      corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, n: Int = 5, minOverlap: Int = 1): DataFrame = {
    val dirty = overlapCounts(corpus, idCol, textCol, bench, n)
      .where(col("n_overlap") >= minOverlap)
      .select(idCol)
    corpus.join(broadcast(dirty), Seq(idCol), "left_anti")
  }

  // ------------------------------------------------- DuckDB oracle SQL ----

  /** Shared shingle-hash CTE: distinct n-gram hash list per row of `table`
    * (relation alias `alias` with columns (doc_id_, hs)).
    */
  private def gramCte(table: String, idCol: String, textCol: String,
                      n: Int, alias: String, whereSql: String): String = {
    val shingleExpr = (0 until n).map(j => s"t[i+$j]").mkString("||' '||")
    val where = if (whereSql.isEmpty) "" else s" WHERE $whereSql"
    s"""${alias}_t AS (SELECT $idCol AS doc_id_, string_split($textCol, ' ') AS t FROM $table$where),
$alias AS (SELECT doc_id_, list_transform(list_distinct(CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')]
  ELSE list_transform(generate_series(1, len(t)-${n - 1}), i -> $shingleExpr) END),
  x -> CAST(('0x'||substr(md5(x),1,15)) AS BIGINT)) AS hs FROM ${alias}_t)"""
  }

  /** CTE chain (no leading WITH) ending in `ov` = (doc_id_, n_overlap) for
    * overlapping docs of `corpusRel` (a table OR an upstream CTE name) vs
    * the benchmark subset of `benchTable` — the composable fragment
    * [[flagOracle]] and [[CorpusPipeline.prepareOracle]] both build on.
    */
  def overlapCtes(
      corpusRel: String, idCol: String, textCol: String,
      benchTable: String, benchWhereSql: String, n: Int): String =
    s"""${gramCte(corpusRel, idCol, textCol, n, "cg", "")},
${gramCte(benchTable, idCol, textCol, n, "bg", benchWhereSql)},
bset AS (SELECT DISTINCT unnest(hs) AS gram_h FROM bg),
ch AS (SELECT doc_id_, unnest(hs) AS gram_h FROM cg),
ov AS (SELECT doc_id_, count(*) AS n_overlap FROM ch JOIN bset USING (gram_h) GROUP BY doc_id_)"""

  /** Oracle for [[flag]] with the benchmark defined as a filtered subset of
    * the same table (`benchWhereSql`), e.g. `doc_id % 50 = 0`.
    */
  def flagOracle(
      table: String, idCol: String, textCol: String,
      benchWhereSql: String, n: Int = 5, minOverlap: Int = 1,
      keepCols: Seq[String] = Seq.empty): String = {
    val extra = if (keepCols.isEmpty) "" else keepCols.map(c => s"d.$c").mkString(", ", ", ", "")
    s"""WITH ${overlapCtes(table, idCol, textCol, table, benchWhereSql, n)}
SELECT d.$idCol$extra, coalesce(o.n_overlap, 0) AS n_overlap,
  coalesce(o.n_overlap, 0) >= $minOverlap AS contaminated
FROM $table d LEFT JOIN ov o ON o.doc_id_ = d.$idCol ORDER BY d.$idCol""".stripMargin
  }
}
