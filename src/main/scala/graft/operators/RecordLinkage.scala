package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked record linkage — entity resolution across tables that share no
  * key (the Fellegi–Sunter shape with integer agreement weights): join
  * candidate pairs on a BLOCKING key (never a cartesian), score each pair
  * as the sum of per-field agree/disagree weights, keep pairs at or above
  * a threshold. The cross-source complement of the dedup family: L1/L2
  * find the same TEXT, this finds the same ENTITY behind differing
  * records (CRM vs billing, two crawls' author fields, user accounts
  * across products).
  *
  * Weights are caller-supplied integers (log-likelihood-ratio shaped:
  * positive for agreement on a discriminative field, negative for
  * disagreement) so the score is exact and the whole operator replays
  * bit-identically in the oracle. Field comparisons are NULL-SAFE
  * equality (NULL agrees with NULL — two systems both lacking a phone is
  * weak evidence, weight it accordingly); derive fuzzy features (prefixes,
  * normalized forms, phonetic codes) as columns BEFORE calling.
  *
  * Scale shape: one hash equi-join on the blocking key — candidate volume
  * is O(Σ block²), the blocking designer's contract (same posture as the
  * L2 LSH bands; size blocks like buckets); scoring is scan-stage
  * integer arithmetic on the joined rows; the threshold prunes before
  * anything else shuffles. A whale block (one nation holding half the
  * records) is WIRED to the equi-join salting posture (the IVF probe-side
  * opt-in discipline): `saltBuckets > 1` splits the a-side of every block
  * across `saltBuckets` shuffle tasks (random salt) while the b-side
  * replicates per bucket — each candidate pair still meets exactly once
  * (the b copy carrying the a row's salt), so the result is provably
  * unchanged and only task-level parallelism shifts. Candidate VOLUME is
  * untouched — salting fixes the one-task wall-clock/spill concentration,
  * not the O(block²) cost, which only better blocking reduces.
  */
object RecordLinkage {

  /** One field's contribution: null-safe `aCol = bCol` adds `agree`,
    * anything else adds `disagree` (typically negative).
    */
  final case class FieldCompare(aCol: String, bCol: String,
                                agree: Long, disagree: Long)

  /** (a_key, b_key, score ≥ minScore) over block-joined candidate pairs.
    * `blockOn` pairs (aCol, bCol) form the equi-join key (NULL blocking
    * keys never pair — the standard equi-join contract).
    */
  def score(a: DataFrame, b: DataFrame, blockOn: Seq[(String, String)],
            fields: Seq[FieldCompare], aKey: String, bKey: String,
            minScore: Long, saltBuckets: Int = 1): DataFrame = {
    require(blockOn.nonEmpty, "blocking is mandatory — an unblocked linkage is a cartesian")
    require(fields.nonEmpty, "at least one field comparison")
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    val aCols = (aKey +: (blockOn.map(_._1) ++ fields.map(_.aCol))).distinct
    val bCols = (bKey +: (blockOn.map(_._2) ++ fields.map(_.bCol))).distinct
    val al = a.select(aCols.map(c => col(c).as(s"__a_$c")): _*)
    val bl = b.select(bCols.map(c => col(c).as(s"__b_$c")): _*)
    val blockCond = blockOn.map { case (x, y) => col(s"__a_$x") === col(s"__b_$y") }
      .reduce(_ && _)
    val sc = fields.map { f =>
      when(col(s"__a_${f.aCol}") <=> col(s"__b_${f.bCol}"),
        lit(f.agree)).otherwise(lit(f.disagree))
    }.reduce(_ + _)
    // whale-block salting (opt-in): any salt value in [0, buckets) is
    // correct — each a row meets each matching b row exactly once, via
    // the b replica carrying that a row's salt — so the salt affects only
    // which shuffle task a pair lands on, never the pair set. The salt is
    // content-derived (hash of the a key), not rand(): deterministic
    // under AQE re-sharding and stage retries, the repo's no-RNG law
    val (alS, blS, cond) =
      if (saltBuckets == 1) (al, bl, blockCond)
      else (
        al.withColumn("__salt_a",
          pmod(xxhash64(col(s"__a_$aKey")), lit(saltBuckets)).cast("int")),
        bl.withColumn("__salt_b", explode(sequence(lit(0), lit(saltBuckets - 1)))),
        blockCond && col("__salt_a") === col("__salt_b"))
    alS.join(blS, cond)
      .select(col(s"__a_$aKey").as("a_key"), col(s"__b_$bKey").as("b_key"),
        sc.cast("long").as("score"))
      .where(col("score") >= minScore)
  }

  /** DuckDB replay of [[score]] — `IS NOT DISTINCT FROM` is the null-safe
    * equality, the blocking join and weight CASEs mirror exactly.
    * `aSql`/`bSql` are full SELECTs producing the same derived columns the
    * Spark side pre-computed.
    */
  def scoreOracle(aSql: String, bSql: String, blockOn: Seq[(String, String)],
                  fields: Seq[FieldCompare], aKey: String, bKey: String,
                  minScore: Long): String = {
    val joinCond = blockOn.map { case (x, y) => s"a.$x = b.$y" }.mkString(" AND ")
    val scoreSql = fields.map { f =>
      s"CASE WHEN a.${f.aCol} IS NOT DISTINCT FROM b.${f.bCol} " +
        s"THEN ${f.agree} ELSE ${f.disagree} END"
    }.mkString(" + ")
    s"""WITH p AS (SELECT a.$aKey AS a_key, b.$bKey AS b_key,
  CAST($scoreSql AS BIGINT) AS score
FROM ($aSql) a JOIN ($bSql) b ON $joinCond)
SELECT a_key, b_key, score FROM p WHERE score >= $minScore
ORDER BY a_key, b_key""".stripMargin
  }
}
