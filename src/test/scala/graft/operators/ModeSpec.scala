package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact mode: counts, smallest-value tie rule, NULL contracts. */
class ModeSpec extends SparkSpec {

  import spark.implicits._

  test("mode with counts and distinct cardinality; ties take the smallest") {
    val df = Seq(("g", 5L), ("g", 5L), ("g", 9L), ("g", 9L), ("g", 1L),
      ("h", 3L)).toDF("grp", "v")
    val got = Mode.perGroup(df, "grp", "v")
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // g: 5 and 9 tie at 2 — the smaller value wins
    assert(got.toSeq == Seq(("g", 5L, 2L, 3L), ("h", 3L, 1L, 1L)))
  }

  test("NULL values carry no vote; NULL group is a stratum; negatives") {
    val df = Seq((Some("g"), Some(-7L)), (Some("g"), Some(-7L)),
      (Some("g"), None), (None, Some(4L)))
      .toDF("grp", "v")
    val got = Mode.perGroup(df, "grp", "v").collect()
      .map(r => (if (r.isNullAt(0)) "∅" else r.getString(0), r.getLong(1),
        r.getLong(2))).toSet
    assert(got == Set(("g", -7L, 2L), ("∅", 4L, 1L)))
    intercept[IllegalArgumentException] {
      Mode.perGroup(df.withColumn("v", col("v").cast("double")), "grp", "v")
    }
  }
}
