package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextFunctions.{hash60, tokens}

/** Feature hashing (the "hashing trick") — project each document's bag of
  * tokens onto a fixed `dim`-dimensional sparse vector by hashing tokens
  * to bucket indices: feature[b] = Σ count(token) over tokens with
  * md5₆₀(token) mod dim = b. The vocabulary-free featurizer for linear
  * quality classifiers and fastText-style filters at corpus scale — no
  * vocabulary build, no OOV, a fixed schema however the corpus grows.
  *
  * Output is the sparse triple form (id, bucket, tf) — the layout a
  * 100 TB feature store wants (dense vectors of dim 2²⁰ would be
  * overwhelmingly zeros). The md5-based bucket is the
  * [[graft.functions.Md5Prefix60]] arithmetic an oracle replays exactly.
  *
  * Scale shape: tokenization and bucket assignment are scan-stage
  * (codegen'd md5 per distinct token occurrence); the only shuffle is the
  * partial-agg'd groupBy on (id, bucket) — and since per-document state
  * is ≤ dim counters, a map partition ships at most dim rows per document
  * it holds. A stopword-heavy corpus concentrates counts in few buckets
  * WITHIN each document — never across the key space (id is in the key).
  */
object FeatureHash {

  /** (idCol, bucket, tf) — one row per document × non-empty bucket.
    * Empty-string tokens (split artifacts of leading/trailing/double
    * spaces) carry no signal and are dropped.
    */
  def featurize(df: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    df.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .where(col("__tok") =!= "")
      .select(col(idCol), pmod(hash60(col("__tok")), lit(dim.toLong)).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("tf"))
  }

  /** DuckDB replay of [[featurize]] — same split/empty-drop tokenizer,
    * same md5₆₀ mod dim bucket (md5₆₀ is non-negative, so plain % is
    * already the positive mod).
    */
  def oracleSql(table: String, idCol: String, textCol: String, dim: Int): String =
    s"""WITH t AS (SELECT $idCol, unnest(string_split($textCol, ' ')) AS tok FROM $table),
b AS (SELECT $idCol,
  CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) % $dim AS bucket
  FROM t WHERE tok <> '')
SELECT $idCol, bucket, count(*) AS tf FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Linear-model inference over hashed features — score(doc) =
    * Σ_buckets tf(bucket) · w(bucket), the fastText-style quality-filter
    * scoring pass that decides keep/drop for every document in the
    * corpus. Weights are INTEGER (train in float, quantize once to
    * milli-units): the dot product is then exact integer arithmetic —
    * order-independent, engine-independent, hashable — and a threshold
    * comparison on it is stable under any partitioning.
    *
    * Scale shape: the weight vector (dim entries) rides into the plan as
    * a broadcast-sized array literal evaluated scan-stage via
    * `element_at`; scoring reuses [[featurize]]'s one partial-agg'd
    * shuffle and adds a per-document sum — nothing new crosses the wire.
    * dim is bounded by the literal size (~10⁶ is fine; a 2²⁰-dim model is
    * 8 MB of plan — switch to a broadcast join on bucket beyond that).
    */
  def scoreLinear(df: DataFrame, idCol: String, textCol: String,
                  weights: Array[Long]): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val dim = weights.length
    featurize(df, idCol, textCol, dim)
      .withColumn("__w", element_at(
        array(weights.toIndexedSeq.map(w => lit(w)): _*), col("bucket").cast("int") + 1))
      .groupBy(col(idCol))
      .agg(sum(col("tf") * col("__w")).as("score"))
  }

  /** DuckDB replay of [[scoreLinear]]: same featurize CTEs, weight lookup
    * from an inline VALUES list, same integer dot product.
    */
  def scoreOracleSql(table: String, idCol: String, textCol: String,
                     weights: Array[Long]): String = {
    val dim = weights.length
    val values = weights.zipWithIndex
      .map { case (w, i) => s"($i, ${w}::BIGINT)" }.mkString(", ")
    s"""WITH t AS (SELECT $idCol, unnest(string_split($textCol, ' ')) AS tok FROM $table),
b AS (SELECT $idCol,
  CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) % $dim AS bucket
  FROM t WHERE tok <> ''),
f AS (SELECT $idCol, bucket, count(*) AS tf FROM b GROUP BY 1, 2),
w(bucket, wt) AS (VALUES $values)
SELECT f.$idCol, CAST(sum(f.tf * w.wt) AS BIGINT) AS score
FROM f JOIN w ON f.bucket = w.bucket
GROUP BY f.$idCol ORDER BY f.$idCol""".stripMargin
  }
}
