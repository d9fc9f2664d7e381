package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC net-effect compaction — collapse an insert/update/delete change
  * log to ONE net operation per key, the Debezium/Kafka-compaction step
  * that keeps a downstream replay from reprocessing every intermediate
  * version: a key inserted and later deleted within the segment nets to
  * NOTHING; inserted and still alive nets to one INSERT carrying the
  * final payload; pre-existing and deleted nets to one DELETE; anything
  * else nets to one UPDATE with the final payload. (The difference from
  * [[graft.streaming.LakeIngest]]'s last-writer-wins upsert: this
  * produces the minimal op STREAM for a downstream consumer, not the
  * merged table state.)
  *
  *   net(first_op, last_op) = I,D → ∅ | I,_ → I | _,D → D | _,_ → U
  *
  * Ops are the literal strings "I"/"U"/"D"; anything else fails the
  * plan loudly (a typo'd op silently defaulting to UPDATE is how replay
  * streams corrupt). DELETE rows carry NULL payload (the payload of a
  * deletion is meaningless and a stale one misleads).
  *
  * Scale shape: ONE partial-agg'd groupBy per key — first/last are
  * `min/max(struct(seq, …))` elections, so a whale key's 10⁸ changes
  * collapse map-side; no window, no sort. CONTRACT: `seqCol` must
  * totally order a key's changes — (key, seq) unique. On a tie the
  * Spark struct comparison falls through to op/payload while the
  * oracle's windows pick an arbitrary row, so tied input is UNDEFINED
  * cross-engine (the [[graft.llm.Dedup.dedupKeepBest]] uniqueness
  * posture); NULL key/seq rows drop.
  */
object CdcCompact {

  /** (key, net_op, payload... of the final state) — keys netting to
    * nothing are absent.
    */
  def netEffect(log: DataFrame, keyCol: String, seqCol: String,
                opCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "at least one payload column")
    val checkedOp = when(col(opCol).isin("I", "U", "D"), col(opCol))
      .otherwise(raise_error(concat(lit("CdcCompact: unknown op '"),
        col(opCol), lit("' — expected I/U/D"))))
    val lastStruct = struct(
      (col(seqCol).as("s") +: checkedOp.as("o") +:
        payloadCols.map(c => col(c).as(c))): _*)
    val netted = log
      .where(col(keyCol).isNotNull && col(seqCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(min(struct(col(seqCol).as("s"), checkedOp.as("o"))).as("__f"),
        max(lastStruct).as("__l"))
      .withColumn("net_op",
        when(col("__f.o") === "I" && col("__l.o") === "D", lit(null))
          .when(col("__f.o") === "I", lit("I"))
          .when(col("__l.o") === "D", lit("D"))
          .otherwise(lit("U")))
      .where(col("net_op").isNotNull)
    netted.select(
      (col("key") +: col("net_op") +:
        payloadCols.map(c =>
          when(col("net_op") === "D", lit(null))
            .otherwise(col(s"__l.$c")).as(c))): _*)
  }

  /** DuckDB replay of [[netEffect]]. */
  def oracleSql(table: String, keyCol: String, seqCol: String,
                opCol: String, payloadCols: Seq[String]): String = {
    val pay = payloadCols.mkString(", ")
    val lastPay = payloadCols
      .map(c => s"CASE WHEN net_op = 'D' THEN NULL ELSE $c END AS $c")
      .mkString(", ")
    s"""WITH l AS (
  SELECT $keyCol AS key, $seqCol AS s, $opCol AS o, $pay,
    row_number() OVER (PARTITION BY $keyCol ORDER BY $seqCol DESC) AS rl,
    first_value($opCol) OVER (PARTITION BY $keyCol ORDER BY $seqCol) AS fo
  FROM $table WHERE $keyCol IS NOT NULL AND $seqCol IS NOT NULL),
n AS (
  SELECT key, fo AS first_op, o AS last_op, $pay,
    CASE WHEN fo = 'I' AND o = 'D' THEN NULL
         WHEN fo = 'I' THEN 'I'
         WHEN o = 'D' THEN 'D'
         ELSE 'U' END AS net_op
  FROM l WHERE rl = 1)
SELECT key, net_op, $lastPay
FROM n WHERE net_op IS NOT NULL ORDER BY key""".stripMargin
  }
}
