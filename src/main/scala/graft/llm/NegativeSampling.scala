package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextFunctions.hash60

/** Deterministic negative-pair sampling for contrastive training — for
  * every anchor row, `k` pseudo-random partners drawn uniformly from the
  * corpus by hash arithmetic, not RNG: partner_j(anchor) = the row at
  * dense position `md5₆₀(id ∥ ":" ∥ j) mod n` in id order. Embedding
  * models (retrieval bi-encoders, CLIP-style contrastive objectives)
  * consume exactly this shape: (anchor, negative) pairs, reproducible run
  * to run so a resumed job sees the same pairs.
  *
  * Exactness: the md5-based index is the [[graft.functions.Md5Prefix60]]
  * arithmetic a DuckDB oracle replays bit-identically; the id→position
  * map is the exact dense rank in id order. A hash that lands on the
  * anchor itself steps to the next position (mod n) — still uniform over
  * the other n−1 rows up to the single-step bias; with n = 1 the pair is
  * dropped (no negative exists).
  *
  * Scale shape (100 TB): one range exchange + parallel sorts for the
  * dense index ([[graft.core.DenseIndex]] — the offset pass touches
  * numPartitions rows); anchors explode ×k in the scan stage; partner
  * resolution is ONE equi-join on the 8-byte dense position. No
  * cartesian, no RNG state, no driver materialization.
  */
object NegativeSampling {

  /** (anchor_id, j, neg_id) for j in 0..k−1. `idCol` must be unique and
    * non-null; output order is engine-independent.
    */
  def negativePairs(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val ids = df.select(col(idCol))
      .repartitionByRange(col(idCol)).sortWithinPartitions(idCol)
    // localCheckpoint, NOT persist: idx is consumed twice (anchors and
    // the partner lookup) and DenseIndex evaluates its input twice, so
    // the indexed frame must be pinned. persist() is empirically WRONG
    // here: caching re-plans the subtree under AQE's cached-plan rules,
    // which decouples DenseIndex's two internal evaluations of the range
    // exchange (its offset join relies on exchange reuse for partition-id
    // stability) and silently DROPS rows. The checkpoint materializes one
    // consistent snapshot; the durability tradeoff (blocks die with their
    // executor) is the same one the iterative operators already accept.
    // pinned variant: range-exchange layouts are not replay-deterministic
    // (see DenseIndex.withDenseIndexPinned)
    val idx = graft.core.DenseIndex.withDenseIndexPinned(ids, "__idx")
      .localCheckpoint(false)
    // count from the RAW input: it doesn't need the sorted lineage
    val nDf = df.agg(count(lit(1)).as("__n"))
    val anchors = idx.crossJoin(broadcast(nDf))
      .select(col(idCol).as("anchor_id"), col("__idx"), col("__n"),
        explode(sequence(lit(0L), lit((k - 1).toLong))).as("j"))
      .withColumn("__h",
        pmod(hash60(concat(col("anchor_id").cast("string"), lit(":"), col("j"))), col("__n")))
      .withColumn("__nidx",
        when(col("__h") === col("__idx"), (col("__h") + 1) % col("__n"))
          .otherwise(col("__h")))
      .where(col("__nidx") =!= col("__idx")) // n = 1: no negative exists
    anchors.join(
        idx.select(col("__idx").as("__nidx"), col(idCol).as("neg_id")), "__nidx")
      .select(col("anchor_id"), col("j"), col("neg_id"))
  }

  /** DuckDB replay of [[negativePairs]]: row_number-based dense index in
    * id order (the oracle can afford the global sort), identical md5₆₀
    * partner arithmetic, same self-collision step and n = 1 drop.
    */
  def oracleSql(table: String, idCol: String, k: Int): String = {
    val h = s"CAST(('0x'||substr(md5(CAST(anchor_id AS VARCHAR)||':'||CAST(j AS VARCHAR)),1,15)) AS BIGINT)"
    s"""WITH x AS (SELECT $idCol, row_number() OVER (ORDER BY $idCol) - 1 AS idx,
  count(*) OVER () AS n FROM $table),
a AS (SELECT x.$idCol AS anchor_id, x.idx, x.n, j
  FROM x CROSS JOIN (SELECT unnest(range($k)) AS j)),
p AS (SELECT anchor_id, j, idx, n, $h % n AS h FROM a),
q AS (SELECT anchor_id, j, idx,
  CASE WHEN h = idx THEN (h + 1) % n ELSE h END AS nidx FROM p)
SELECT q.anchor_id, CAST(q.j AS BIGINT) AS j, x.$idCol AS neg_id
FROM q JOIN x ON q.nidx = x.idx WHERE q.nidx <> q.idx
ORDER BY anchor_id, j""".stripMargin
  }
}
