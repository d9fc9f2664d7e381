package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Markup-signal contracts: hand-checked counts per rule, clean-text
  * zeros, NULL drops, zero-exchange plan.
  */
class MarkupSignalsSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: (Long, String)*) =
    MarkupSignals.counts(rows.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

  test("hand-checked: tags, entities, urls, code chars") {
    val got = run(
      1L -> "<div class=\"x\">hello</div> &amp; more &#39;quoted&#39;",
      2L -> "see https://a.example/path?q=1 and http://b.io now",
      3L -> "function f() { return 1; }",
      4L -> "perfectly clean prose with no markup at all")
    // the 3 entity-terminating semicolons also hit the code-char rule —
    // raw counts deliberately overlap (signals, not a parse)
    assert(got(1L) == ((2L, 3L, 0L, 3L, 8L)))
    assert(got(2L) == ((0L, 0L, 2L, 0L, 2L)))
    assert(got(3L) == ((0L, 0L, 0L, 3L, 3L))) // { } ;
    assert(got(4L) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("a bare less-than is not a tag; bare ampersand is not an entity") {
    val got = run(1L -> "3 < 5 & 7 > 2")
    assert(got(1L) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("NULL text drops; plan is pure scan stage") {
    val df = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val q = MarkupSignals.counts(df, "doc_id", "text")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
