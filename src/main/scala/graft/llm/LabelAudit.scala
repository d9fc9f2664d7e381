package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** kNN label-consistency audit — the classic label-noise screen (Confident
  * Learning's cheap cousin): a labeled example whose k nearest neighbors
  * in embedding space vote for a DIFFERENT label is either mislabeled, an
  * outlier, or sits on a genuine class boundary; all three are exactly the
  * rows a curation pass wants a human (or a re-labeler) to look at before
  * training on them.
  *
  * Determinism: neighbor ranking rides [[Similarity.bruteForceKnn]]'s
  * exact-integer quantized dot with the (score DESC, id ASC) total order;
  * the majority vote breaks ties toward the SMALLEST label (min-struct on
  * (−votes, label)) so the verdict is total and engine-replayable. Rows
  * with a NULL label carry no vote and take no audit (dropped from both
  * sides — the equi-join contract).
  *
  * Scale shape: queries broadcast against the corpus scan (the brute-force
  * contract — audit a SAMPLE of the corpus per pass, or swap in
  * [[IvfIndex.search]] for the full-corpus form; the vote rollup is
  * identical); the vote aggregation is two partial-agg'd shuffles of the
  * k·|queries|-sized neighbor frame, never of the corpus.
  *
  * Output: (idCol, label, majority_label, majority_votes, n_agree,
  * mismatch) — one row per audited query; `mismatch` is the screen.
  */
object LabelAudit {

  def labelConsistency(corpus: DataFrame, queries: DataFrame, k: Int,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       labelCol: String = "label"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val c = corpus.where(col(labelCol).isNotNull)
    val q = queries.where(col(labelCol).isNotNull)
    val nn = Similarity.bruteForceKnn(c, q, k, idCol, vecCol)
    val neighborLabels = c.select(col(idCol).as("__nid"), col(labelCol).as("__nl"))
    val voted = nn.join(neighborLabels, col("neighbor_id") === col("__nid"))
    val votes = voted.groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("__votes"))
    // majority = max votes, ties to the smallest label: min over
    // (−votes, label) structs — one partial-agg'd reduction, no window
    val majority = votes.groupBy(col("query_id"))
      .agg(min(struct((-col("__votes")).as("nv"), col("__nl").as("l"))).as("__m"))
      .select(col("query_id"), col("__m.l").as("majority_label"),
        (-col("__m.nv")).as("majority_votes"))
    val own = q.select(col(idCol).as("query_id"), col(labelCol).as("label"))
    val agree = votes.select(col("query_id").as("__aq"), col("__nl").as("__al"),
      col("__votes").as("__agree"))
    own
      .join(majority, Seq("query_id"))
      .join(agree,
        col("query_id") === col("__aq") && col("label") === col("__al"), "left")
      .select(col("query_id").as(idCol), col("label"),
        col("majority_label"), col("majority_votes"),
        coalesce(col("__agree"), lit(0L)).as("n_agree"),
        (col("majority_label") =!= col("label")).as("mismatch"))
  }

  /** DuckDB replay of [[labelConsistency]] — extends the brute-force kNN
    * CTE chain with the same vote rollup and (−votes, label) tiebreak.
    */
  def oracleSql(table: String, idCol: String, vecCol: String,
                labelCol: String, queryPred: String, k: Int, dim: Int): String =
    s"""WITH qv AS (SELECT $idCol AS query_id, $labelCol AS own_label,
    ${Similarity.quantSql(vecCol)} AS q
  FROM $table WHERE ($queryPred) AND $labelCol IS NOT NULL),
cv AS (SELECT $idCol AS neighbor_id, $labelCol AS nl,
    ${Similarity.quantSql(vecCol)} AS c
  FROM $table WHERE $labelCol IS NOT NULL),
s AS (SELECT query_id, own_label, neighbor_id, nl,
    ${Similarity.dotSql("q", "c", dim)} AS score
  FROM qv, cv WHERE query_id != neighbor_id),
r AS (SELECT query_id, own_label, nl,
    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM s),
v AS (SELECT query_id, own_label, nl, count(*) AS votes
  FROM r WHERE rank <= $k GROUP BY 1, 2, 3),
m AS (SELECT query_id, own_label, nl AS majority_label, votes AS majority_votes,
    row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, nl ASC) AS mr
  FROM v)
SELECT m.query_id AS $idCol, m.own_label AS label, m.majority_label,
  CAST(m.majority_votes AS BIGINT) AS majority_votes,
  CAST(coalesce(a.votes, 0) AS BIGINT) AS n_agree,
  m.majority_label <> m.own_label AS mismatch
FROM m LEFT JOIN v a ON m.query_id = a.query_id AND a.nl = m.own_label
WHERE m.mr = 1
ORDER BY m.query_id""".stripMargin
}
