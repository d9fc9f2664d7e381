package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kendall tau-b: hand pair counting with every tie class, the pair-sum
  * identity, brute-force differential, tau float anchors.
  */
class KendallTauSpec extends SparkSpec {

  import spark.implicits._

  /** O(n²) reference pair classifier. */
  private def brute(rows: Seq[(Long, Long)])
  : (Long, Long, Long, Long, Long) = {
    var conc, disc, tx, ty, txy = 0L
    for (i <- rows.indices; j <- rows.indices if i < j) {
      val ((x1, y1), (x2, y2)) = (rows(i), rows(j))
      if (x1 == x2 && y1 == y2) txy += 1
      else if (x1 == x2) tx += 1
      else if (y1 == y2) ty += 1
      else if ((x1 < x2) == (y1 < y2)) conc += 1
      else disc += 1
    }
    (conc, disc, tx, ty, txy)
  }

  test("hand case exercising all five pair classes") {
    val rows = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val df = rows.map { case (x, y) => ("g", x, y) }.toDF("grp", "x", "y")
    val r = KendallTau.tauB(df, Seq("grp"), "x", "y").collect().head
    val (c, d, tx, ty, txy) = brute(rows)
    assert(r.getAs[Long]("conc") == c)
    assert(r.getAs[Long]("disc") == d)
    assert(r.getAs[Long]("tie_x") == tx)
    assert(r.getAs[Long]("tie_y") == ty)
    assert(r.getAs[Long]("tie_xy") == txy)
    val n = r.getAs[Long]("n")
    assert(c + d + tx + ty + txy == n * (n - 1) / 2, "pair-sum identity")
  }

  test("brute-force differential on a scrambled series; tau anchors") {
    val rows = (0 until 40).map(i =>
      (((i * 7) % 13).toLong, ((i * 11) % 9).toLong))
    val df = rows.map { case (x, y) => ("g", x, y) }.toDF("grp", "x", "y")
    val r = KendallTau.tauB(df, Seq("grp"), "x", "y").collect().head
    val (c, d, tx, ty, txy) = brute(rows)
    assert((r.getAs[Long]("conc"), r.getAs[Long]("disc"),
      r.getAs[Long]("tie_x"), r.getAs[Long]("tie_y"),
      r.getAs[Long]("tie_xy")) == ((c, d, tx, ty, txy)))
    // perfect agreement / reversal anchors for the float tau
    val up = (1L to 10L).map(i => ("g", i, i)).toDF("grp", "x", "y")
    assert(math.abs(KendallTau.tauB(up, Seq("grp"), "x", "y")
      .head().getAs[Double]("tau_b") - 1.0) < 1e-12)
    val dn = (1L to 10L).map(i => ("g", i, -i)).toDF("grp", "x", "y")
    assert(math.abs(KendallTau.tauB(dn, Seq("grp"), "x", "y")
      .head().getAs[Double]("tau_b") + 1.0) < 1e-12)
  }

  test("groups count independently; NULLs drop; plan has no cartesian") {
    val df = Seq(("a", Some(1L), Some(1L)), ("a", Some(2L), Some(2L)),
      ("b", Some(1L), Some(2L)), ("b", Some(2L), Some(1L)),
      ("b", None, Some(9L)), ("b", Some(9L), None))
      .toDF("grp", "x", "y")
    val q = KendallTau.tauB(df, Seq("grp"), "x", "y")
    val got = q.collect().map(r => r.getString(0) ->
      (r.getAs[Long]("conc"), r.getAs[Long]("disc"))).toMap
    assert(got("a") == ((1L, 0L)))
    assert(got("b") == ((0L, 1L)))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("a group with one distinct x survives with zero conc/disc (r10 review fix)") {
    val df = Seq(("c", 5L, 1L), ("c", 5L, 2L), ("c", 5L, 2L),
      ("d", 1L, 1L), ("d", 2L, 2L)).toDF("grp", "x", "y")
    val got = KendallTau.tauB(df, Seq("grp"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.contains("c"), "constant-x group must not vanish")
    val c = got("c")
    assert(c.getAs[Long]("conc") == 0L && c.getAs[Long]("disc") == 0L)
    assert(c.getAs[Long]("tie_x") == 2L)  // (1,2),(1,2') same x diff y
    assert(c.getAs[Long]("tie_xy") == 1L) // the two (5,2) rows
    val n = c.getAs[Long]("n")
    assert(0L + 0L + 2L + 0L + 1L == n * (n - 1) / 2)
  }
}
