package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge-rule training (Sennrich et al. 2016) — learn the top-N
  * byte-pair merges from a corpus, the step that builds a tokenizer's
  * vocabulary before any model trains. Classic BPE is defined over WORD
  * FREQUENCIES, and that is what makes it tractable at corpus scale: the
  * corpus collapses to a (word, count) vocabulary in ONE pass, and every
  * merge round after that runs over vocabulary-sized data — 100 TB of
  * text with a 10⁸-word vocabulary never touches the corpus again.
  *
  * Determinism: pair selection is (count DESC, left ASC, right ASC) — a
  * total order, so the learned merge list is bit-identical on any engine
  * and partitioning. The string order is Spark's BINARY UTF-8 byte order
  * (NOT Java's UTF-16 code-unit order — the two disagree between U+E000..
  * U+FFFF and supplementary characters; any replaying implementation must
  * compare UTF-8 bytes). Merge application is the standard leftmost,
  * non-overlapping fold ("aaa" under (a,a) → "aa","a").
  *
  * Scale shape per round: adjacent-pair counts are a partial-agg'd
  * groupBy over vocab rows (pairs weighted by word count — a whale WORD
  * is one vocab row, not |occurrences| rows); the argmax is a 1-row
  * driver collect (the iterative-algorithm heartbeat, like k-means
  * centroids); the merge applies as a scan-stage HOF fold over each
  * word's symbol array; lineage is truncated per round
  * ([[graft.operators.GraphRank]]'s checkpoint discipline — plan depth
  * stays O(1) in rounds). Superseded round checkpoints are reclaimed by
  * the ContextCleaner as the driver drops each round's reference (the
  * [[graft.llm.Dedup]] prepareBands block-ownership discipline); peak
  * storage while a round hands over is two vocab copies.
  *
  * SQL oracle (r8): the N-round fixpoint IS replayable — [[learnMergesOracle]]
  * unrolls it into N materialized CTE rounds. Each round recomputes pair
  * counts, picks the same (cnt DESC, x, y) argmax, and applies the merge
  * with `list_reduce` over a STRING accumulator (symbols joined on an
  * out-of-alphabet separator; "ends with sep+x" replays the
  * last-element-equals test, so the leftmost non-overlapping fold is
  * bit-identical — "aaa" under (a,a) → "aa","a" on both engines). The
  * driver gate is therefore hash-checked end-to-end; the from-scratch
  * reference implementation in the spec remains as the third independent
  * derivation.
  */
object BpeTrain {

  /** End-of-word marker — distinguishes "low</w>" from the prefix "low". */
  val Eow = "</w>"

  /** (word, c) vocabulary with symbol arrays: chars plus the terminal
    * [[Eow]] marker.
    */
  def vocabulary(df: DataFrame, textCol: String): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("c"))
      .withColumn("syms", concat(split(col("word"), ""), array(lit(Eow))))

  /** Adjacent symbol pairs weighted by word count: (x, y, cnt). */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("c"), explode(zip_with(col("syms"),
        slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
        (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
      .where(col("p.y").isNotNull)
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(sum("c").as("cnt"))

  /** ONE definition of the leftmost non-overlapping merge fold of
    * adjacent (a, b) → a+b — scan-stage, per-word cost O(len²) on short
    * arrays; references `syms` exactly once (see [[encode]] for why that
    * matters).
    */
  private def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === a && s === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))

  /** [[mergeFold]] behind a codegen'd `array_contains` pre-test — keeps
    * the interpreted fold off the words that cannot contain the pair (the
    * vast majority of the vocabulary for any one merge). References
    * `syms` three times, so ONLY apply it to a leaf column (the training
    * rounds), never inside a column fold.
    */
  private def mergePair(syms: Column, a: String, b: String): Column =
    when(array_contains(syms, a) && array_contains(syms, b),
      mergeFold(syms, a, b))
      .otherwise(syms)

  /** The learned merge table (rank, left, right), rank 1 = first merge.
    * Stops early when no pair reaches `minCount`.
    */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int,
                  minCount: Long = 2L, loopPartitions: Int = 0): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    val spark = df.sparkSession
    // the loop runs vocabulary-sized, not corpus-sized: re-partition the
    // vocab down for the rounds (each round is a full job — 32 near-empty
    // tasks per round is pure scheduling overhead). loopPartitions = 0
    // keeps the corpus aggregation's layout; size it ~vocab/64MB when set.
    val v0 = vocabulary(df, textCol)
    var vocab = (if (loopPartitions > 0) v0.repartition(loopPartitions) else v0)
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String)]()
    // NOTE deliberately NOT tuning session confs (AQE, shuffle width) for
    // the tiny round queries: session conf is shared mutable state and a
    // concurrent workload on the same session would observe the change
    // (verified as a flaky cross-suite race); the rounds pay a little
    // per-stage re-planning instead. loopPartitions bounds the task count.
    var done = false
    while (!done && merges.length < nMerges) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("x"), col("y")).limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < minCount) done = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((merges.length + 1, a, b))
        vocab = vocab.withColumn("syms", mergePair(col("syms"), a, b))
          .localCheckpoint(false)
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right")
  }

  /** DuckDB replay of [[learnMerges]] — the N-round fixpoint unrolled into
    * N materialized CTE rounds (see class doc). The symbol accumulator is
    * a chr(30)-joined string; chr(30) (ASCII record separator) is outside
    * any sane corpus alphabet, and a corpus that DID contain it would
    * diverge loudly (hash mismatch), never silently. `cnt` stays inside
    * ORDER BY/WHERE (HUGEINT never reaches the final projection).
    */
  def learnMergesOracle(table: String, textCol: String, nMerges: Int,
                        minCount: Long = 2L): String = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    val sep = "chr(30)"
    val rounds = (1 to nMerges).map { k =>
      val prev = s"v${k - 1}"
      s"""p$k AS MATERIALIZED (
  SELECT syms[i] AS x, syms[i + 1] AS y, sum(c) AS cnt
  FROM $prev, unnest(generate_series(1, len(syms) - 1)) AS g(i)
  GROUP BY 1, 2),
t$k AS MATERIALIZED (
  SELECT x, y FROM p$k WHERE cnt >= $minCount
  ORDER BY cnt DESC, x, y LIMIT 1),
v$k AS MATERIALIZED (
  SELECT word, c,
    CASE WHEN t.x IS NULL THEN v.syms
         ELSE string_split(list_reduce(v.syms, (acc, s) ->
           CASE WHEN (acc = t.x OR right(acc, length(t.x) + 1) = $sep || t.x)
                     AND s = t.y
                THEN left(acc, length(acc) - length(t.x)) || t.x || t.y
                ELSE acc || $sep || s END), $sep)
    END AS syms
  FROM $prev v LEFT JOIN t$k t ON TRUE)"""
    }.mkString(",\n")
    val unioned = (1 to nMerges)
      .map(k => s"""SELECT $k AS rank, x AS "left", y AS "right" FROM t$k""")
      .mkString("\nUNION ALL ")
    s"""WITH v0 AS MATERIALIZED (
  SELECT word, count(*) AS c,
    list_append(string_split(word, ''), '$Eow') AS syms
  FROM (SELECT unnest(string_split($textCol, ' ')) AS word
        FROM $table WHERE $textCol IS NOT NULL)
  WHERE word <> '' GROUP BY word),
$rounds
SELECT * FROM (
$unioned
) ORDER BY rank"""
  }

  /** BPE token count per document under a learned merge list: per word,
    * apply the merges in rank order and count surviving symbols — the
    * exact token counting / sequence-packing input for the trained
    * vocabulary. The merge list compiles into nested scan-stage HOF
    * folds, so keep it modest (≲ a few hundred) — a production-size
    * vocabulary would move the fold into a native expression with the
    * merges in a hash map, the same upgrade path MediaDims took.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val word = col("__word")
    val base = concat(split(word, ""), array(lit(Eow)))
    // the SAME mergeFold as training, applied in rank order — but NOT
    // mergePair: its pre-test references the accumulator three times, so
    // folding it over N merges builds a 3^N expression tree (observed as
    // an OOM at N = 10); the plain fold references acc once → linear
    val encoded = merges.foldLeft(base) { case (acc, (a, b)) =>
      mergeFold(acc, a, b)
    }
    df.where(col(textCol).isNotNull)
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("__word"))
      .where(word =!= "")
      .withColumn("__n", size(encoded))
      .groupBy(col(idCol))
      .agg(sum(col("__n")).cast("long").as("n_bpe_tokens"))
  }
}
