package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-label classification evaluation — micro/macro P/R/F1 over
  * label-SET columns (tagging, topic assignment, routing): the
  * multilabel counterpart of [[ModelEval]]'s single-label per-class
  * report, and the two averages disagree by design — micro pools every
  * (row, label) decision (head labels dominate), macro averages
  * per-LABEL scores (tail labels count equally; the fairness read).
  *
  * Exact semantics: label sets deduplicate (`array_distinct` — a
  * doubled tag is one tag, declared); per row tp = |gold ∩ pred|,
  * fp = |pred| − tp, fn = |gold| − tp. Micro publishes the pooled
  * counts plus ONE declared truncating division each for p/r/f1
  * (f1 = 2tp/(2tp+fp+fn) — no float compose). Macro explodes to
  * per-label counts and publishes Σ⌊10⁶·p_l⌋ div |labels| (two-step
  * declared ladder; labels NEVER PREDICTED score precision 0 and stay
  * in the denominator — the sklearn zero_division=0 convention,
  * spec-pinned). Exact-match (subset accuracy) counts rows whose sets
  * coincide. NULL gold rows DROP (unlabeled is not "empty label set");
  * NULL pred means "predicted nothing" (empty, declared).
  *
  * One partial-agg'd row pass for micro + one exploded (group, label)
  * collapse for macro — 8-byte-ish keys, no joins beyond the
  * group-keyed merge of the two readouts.
  */
object MultiLabelEval {

  val Scale = 1000000L

  /** (groupCol, n_rows, exact_match, micro_tp, micro_fp, micro_fn,
    * micro_p_q6, micro_r_q6, micro_f1_q6, n_labels, macro_p_q6,
    * macro_r_q6).
    */
  def evaluate(df: DataFrame, groupCol: String, goldCol: String,
               predCol: String): DataFrame = {
    val gold = array_distinct(col(goldCol))
    val pred = array_distinct(coalesce(col(predCol),
      array().cast("array<string>")))
    val base = df.where(col(goldCol).isNotNull)
      .select(col(groupCol), gold.as("__g"), pred.as("__p"),
        size(array_intersect(gold, pred)).cast("long").as("__tp"))
      .localCheckpoint(true)
    val micro = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(array_sort(col("__g")) === array_sort(col("__p")), 1L)
          .otherwise(0L)).as("exact_match"),
        sum(col("__tp")).as("micro_tp"),
        sum(size(col("__p")).cast("long") - col("__tp")).as("micro_fp"),
        sum(size(col("__g")).cast("long") - col("__tp")).as("micro_fn"))
    def q6(num: org.apache.spark.sql.Column,
           den: org.apache.spark.sql.Column) =
      when(den > 0L, call_function("div", num * lit(Scale), den))
    // per-label counts: a label's tp comes from the intersection, its
    // fp from predictions, fn from golds — explode each leg
    val perLabel = base
      .select(col(groupCol),
        explode(array_union(col("__g"), col("__p"))).as("__l"),
        col("__g"), col("__p"))
      .groupBy(col(groupCol).as("__mg"), col("__l"))
      .agg(
        sum(when(array_contains(col("__g"), col("__l")) &&
          array_contains(col("__p"), col("__l")), 1L).otherwise(0L))
          .as("__ltp"),
        sum(when(!array_contains(col("__g"), col("__l")) &&
          array_contains(col("__p"), col("__l")), 1L).otherwise(0L))
          .as("__lfp"),
        sum(when(array_contains(col("__g"), col("__l")) &&
          !array_contains(col("__p"), col("__l")), 1L).otherwise(0L))
          .as("__lfn"))
    val macroAgg = perLabel.groupBy(col("__mg"))
      .agg(count(lit(1)).as("n_labels"),
        sum(coalesce(q6(col("__ltp"), col("__ltp") + col("__lfp")), lit(0L)))
          .as("__pSum"),
        sum(coalesce(q6(col("__ltp"), col("__ltp") + col("__lfn")), lit(0L)))
          .as("__rSum"))
    micro.join(macroAgg, col(groupCol) <=> col("__mg"), "left")
      .select(col(groupCol), col("n_rows"), col("exact_match"),
        col("micro_tp"), col("micro_fp"), col("micro_fn"),
        q6(col("micro_tp"), col("micro_tp") + col("micro_fp"))
          .as("micro_p_q6"),
        q6(col("micro_tp"), col("micro_tp") + col("micro_fn"))
          .as("micro_r_q6"),
        q6(lit(2L) * col("micro_tp"),
          lit(2L) * col("micro_tp") + col("micro_fp") + col("micro_fn"))
          .as("micro_f1_q6"),
        coalesce(col("n_labels"), lit(0L)).as("n_labels"),
        when(col("n_labels") > 0L,
          call_function("div", col("__pSum"), col("n_labels")))
          .as("macro_p_q6"),
        when(col("n_labels") > 0L,
          call_function("div", col("__rSum"), col("n_labels")))
          .as("macro_r_q6"))
  }

  /** DuckDB replay; `rowsSql` yields (grp, g LIST, p LIST). */
  def oracleSql(rowsSql: String, groupName: String): String =
    s"""WITH base AS (
  SELECT grp, list_distinct(g) AS g,
    list_distinct(coalesce(p, [])) AS p,
    CAST(len(list_intersect(list_distinct(g), list_distinct(coalesce(p, []))))
      AS BIGINT) AS tp
  FROM ($rowsSql) WHERE g IS NOT NULL),
micro AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
    CAST(count(*) FILTER (WHERE list_sort(g) = list_sort(p)) AS BIGINT)
      AS exact_match,
    CAST(sum(tp) AS BIGINT) AS mtp,
    CAST(sum(len(p) - tp) AS BIGINT) AS mfp,
    CAST(sum(len(g) - tp) AS BIGINT) AS mfn
  FROM base GROUP BY grp),
pl AS (SELECT grp, unnest(list_distinct(g || p)) AS l, g, p FROM base),
plc AS (SELECT grp, l,
    CAST(count(*) FILTER (WHERE list_contains(g, l)
      AND list_contains(p, l)) AS BIGINT) AS ltp,
    CAST(count(*) FILTER (WHERE NOT list_contains(g, l)
      AND list_contains(p, l)) AS BIGINT) AS lfp,
    CAST(count(*) FILTER (WHERE list_contains(g, l)
      AND NOT list_contains(p, l)) AS BIGINT) AS lfn
  FROM pl GROUP BY grp, l),
mac AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_labels,
    CAST(sum(CASE WHEN ltp + lfp > 0
      THEN (ltp * $Scale) // (ltp + lfp) ELSE 0 END) AS BIGINT) AS psum,
    CAST(sum(CASE WHEN ltp + lfn > 0
      THEN (ltp * $Scale) // (ltp + lfn) ELSE 0 END) AS BIGINT) AS rsum
  FROM plc GROUP BY grp)
SELECT m.grp AS $groupName, m.n_rows, m.exact_match,
  m.mtp AS micro_tp, m.mfp AS micro_fp, m.mfn AS micro_fn,
  CASE WHEN m.mtp + m.mfp > 0
       THEN (m.mtp * $Scale) // (m.mtp + m.mfp) END AS micro_p_q6,
  CASE WHEN m.mtp + m.mfn > 0
       THEN (m.mtp * $Scale) // (m.mtp + m.mfn) END AS micro_r_q6,
  CASE WHEN 2 * m.mtp + m.mfp + m.mfn > 0
       THEN (2 * m.mtp * $Scale) // (2 * m.mtp + m.mfp + m.mfn)
  END AS micro_f1_q6,
  coalesce(mac.n_labels, 0) AS n_labels,
  CASE WHEN mac.n_labels > 0 THEN mac.psum // mac.n_labels
  END AS macro_p_q6,
  CASE WHEN mac.n_labels > 0 THEN mac.rsum // mac.n_labels
  END AS macro_r_q6
FROM micro m LEFT JOIN mac ON mac.grp IS NOT DISTINCT FROM m.grp
ORDER BY m.grp"""
}
