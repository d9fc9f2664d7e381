package graft.functions

import graft.SparkSpec
import graft.operators.{Croston, ExpSmooth, TokenBucket}
import org.apache.spark.sql.functions._

/** Fold-equivalence for the native [[SeqFold]] family: every member must
  * reproduce the r10 interpreted `aggregate()` HOF recurrence bit-for-bit.
  * Each test compares the operator output against an independent plain-Scala
  * reference fold (sign-split truncating division = Java `/` on longs), on
  * series with negatives, duplicate values, gaps and multiple groups; the
  * ewma case ALSO re-runs the literal r10 HOF expression for a direct
  * old-vs-new equivalence. Plus the r11 pre-buffer bound pins: the window
  * count precedes the collecting aggregate in the executed plan, raises the
  * named message, and `preCheck = false` opts back out.
  */
class SeqFoldSpec extends SparkSpec {
  import spark.implicits._

  // deterministic series: 3 groups × 40 points, mixed signs, idx gaps
  private lazy val series: Seq[(String, Long, Long)] = {
    var seed = 12345L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    for {
      g <- Seq("a", "b", "c")
      k <- 0 until 40
    } yield {
      val idx = 10L + k * 3 + (math.abs(next()) % 3) // gaps of 3±, strictly increasing per k
      (g, idx * 100 + k, (next() % 500))             // unique idx; values in [-499, 499]
    }
  }

  test("EwmaFold matches a plain-Scala reference AND the r10 interpreted HOF") {
    val df = series.toDF("g", "i", "x")
    val got = ExpSmooth.smooth(df, "g", "i", "x", 3, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // plain-Scala reference
    val expect = series.groupBy(_._1).flatMap { case (g, rows) =>
      var prev = 0L; var first = true
      rows.sortBy(_._2).map { case (_, i, x) =>
        val s = if (first) x * 1000L else (3 * x * 1000L + 7 * prev) / 10
        prev = s; first = false
        (g, i, s)
      }
    }.toSet
    assert(got == expect)
    // the literal r10 interpreted HOF, old-vs-new
    val collected = df.groupBy($"g")
      .agg(sort_array(collect_list(struct($"i".cast("long").as("i"),
        $"x".cast("long").as("x")))).as("arr"))
    val zero = expr("named_struct('out', CAST(array() AS ARRAY<STRUCT<i: BIGINT, s: BIGINT>>), " +
      "'prev', CAST(NULL AS BIGINT), 'first', true)")
    val hof = collected.select($"g", explode(aggregate($"arr", zero, (acc, e) => {
      val num = lit(3L) * e.getField("x") * lit(1000L) + lit(7L) * acc.getField("prev")
      val ns = when(acc.getField("first"), e.getField("x") * lit(1000L))
        .otherwise(when(num < 0, lit(-1L)).otherwise(lit(1L)) *
          call_function("div", abs(num), lit(10L)))
      struct(concat(acc.getField("out"),
        array(struct(e.getField("i").as("i"), ns.as("s")))).as("out"),
        ns.as("prev"), lit(false).as("first"))
    }).getField("out")).as("e"))
      .select($"g", $"e.i", $"e.s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == hof)
  }

  test("HoltFold matches a plain-Scala reference") {
    val df = series.toDF("g", "i", "x")
    val got = ExpSmooth.holt(df, "g", "i", "x", 3, 10, 1, 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expect = series.groupBy(_._1).flatMap { case (g, rows) =>
      var pl = 0L; var pb = 0L; var first = true
      rows.sortBy(_._2).map { case (_, i, x) =>
        val xs = x * 1000L
        val nl = if (first) xs else (3 * xs + 7 * (pl + pb)) / 10
        val nb = if (first) 0L else (1 * (nl - pl) + 4 * pb) / 5
        pl = nl; pb = nb; first = false
        (g, i, nl, nb)
      }
    }.toSet
    assert(got == expect)
  }

  test("HoltWintersFold matches a plain-Scala reference across season boundaries") {
    val df = series.toDF("g", "i", "x")
    val got = ExpSmooth.holtWinters(df, "g", "i", "x", 7, 3, 10, 1, 5, 1, 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val expect = series.groupBy(_._1).flatMap { case (g, rows) =>
      val sorted = rows.sortBy(_._2)
      val sHist = new Array[Long](sorted.size)
      var pl = 0L; var pb = 0L
      sorted.zipWithIndex.map { case ((_, i, x), t) =>
        val xs = x * 1000L
        val sm = if (t >= 7) sHist(t - 7) else 0L
        val nl = if (t == 0) xs else (3 * (xs - sm) + 7 * (pl + pb)) / 10
        val nb = if (t == 0) 0L else (1 * (nl - pl) + 4 * pb) / 5
        val ns = if (t == 0) 0L else (1 * (xs - nl) + 3 * sm) / 4
        sHist(t) = ns; pl = nl; pb = nb
        (g, i, nl, nb, ns)
      }
    }.toSet
    assert(got == expect)
  }

  test("CrostonFold matches a plain-Scala reference (zero demand filtered, gaps from idx)") {
    val demand = series.map { case (g, i, x) => (g, i, math.abs(x) % 9) } // zeros included
    val df = demand.toDF("g", "i", "x")
    val got = Croston.method(df, "g", "i", "x", 2, 10, 0L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val expect = demand.filter(_._3 != 0).groupBy(_._1).flatMap { case (g, rows) =>
      var pi = 0L; var pz = 0L; var pp = 0L; var first = true
      rows.sortBy(_._2).map { case (_, i, x) =>
        val gap = if (first) i - 0L else i - pi
        val z = if (first) x * 1000L else (2 * x * 1000L + 8 * pz) / 10
        val p = if (first) gap * 1000L else (2 * gap * 1000L + 8 * pp) / 10
        pi = i; pz = z; pp = p; first = false
        (g, i, gap, z, p)
      }
    }.toSet
    assert(got == expect)
  }

  test("TokenBucketFold matches a plain-Scala reference, fresh and seeded") {
    val events = series.map { case (g, i, x) => (g, i, math.abs(x) + i) } // unique ids
    val df = events.toDF("g", "i", "id")
    val got = TokenBucket.replay(df, "g", "i", "id", 1, 4, 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4))).toSet
    def reference(rows: Seq[(Long, Long)], seed: Option[(Long, Long)]): Seq[(Long, Long, Boolean, Long)] = {
      val cap = 3L * 4L
      var first = seed.isEmpty
      var pi = seed.map(_._1).getOrElse(0L); var pl = seed.map(_._2).getOrElse(0L)
      rows.sortBy(e => (e._1, e._2)).map { case (i, id) =>
        val pre = if (first) cap else math.min(cap, pl + (i - pi) * 1L)
        val adm = pre >= 4L
        val lvl = if (adm) pre - 4L else pre
        pi = i; pl = lvl; first = false
        (id, i, adm, lvl)
      }
    }
    val expect = events.groupBy(_._1).flatMap { case (g, rows) =>
      reference(rows.map(e => (e._2, e._3)), None).map(t => (g, t._1, t._2, t._3, t._4))
    }.toSet
    assert(got == expect)
    // seeded continuation == replaying the concatenation from the split point
    val (head, tail) = events.filter(_._1 == "a").map(e => (e._2, e._3)).sortBy(identity).splitAt(20)
    val headOut = reference(head, None)
    val seed = (headOut.last._2, headOut.last._4)
    val seededDf = tail.toDF("i", "id").agg(
        sort_array(collect_list(struct($"i", $"id"))).as("arr"))
      .select(explode(TokenBucketFold($"arr", lit(seed._1), lit(seed._2), 1, 4, 3)).as("e"))
      .select($"e.id", $"e.i", $"e.adm", $"e.lvl")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3))).toSet
    assert(seededDf == reference(head ++ tail, None).drop(20).toSet)
    // seeded fold with a NULL stored level is store corruption — raises
    val ex = intercept[Exception] {
      tail.toDF("i", "id").agg(sort_array(collect_list(struct($"i", $"id"))).as("arr"))
        .select(TokenBucketFold($"arr", lit(seed._1), lit(null).cast("long"), 1, 4, 3))
        .collect()
    }
    assert(ex.getMessage.contains("seeded fold requires a stored level"))
  }

  test("pre-buffer bound: window count precedes the collect and raises the named message") {
    val df = series.toDF("g", "i", "x")
    val plan = ExpSmooth.smooth(df, "g", "i", "x", 3, 10)
      .queryExecution.executedPlan.toString
    // executedPlan prints top-down, so the (downstream) collecting aggregate
    // must appear BEFORE the (upstream) window in the text
    val aggAt = plan.indexOf("collect_list")
    val winAt = plan.indexOf("Window [")
    assert(aggAt >= 0 && winAt >= 0 && aggAt < winAt, plan.take(1200))
    // one shared exchange: the window's hash partitioning feeds the aggregate
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, plan.take(1200))
    val ex = intercept[Exception] {
      ExpSmooth.smooth(df, "g", "i", "x", 3, 10, maxPoints = 5)
        .write.format("noop").mode("overwrite").save()
    }
    assert(ex.getMessage != null &&
      ex.getMessage.contains("exceeds 5 points — feed a calendar spine"), ex.getMessage)
  }

  test("preCheck = false opts out of the window and keeps the post-collect backstop") {
    val df = series.toDF("g", "i", "x")
    val plan = ExpSmooth.smooth(df, "g", "i", "x", 3, 10, preCheck = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window ["), plan.take(1200))
    val ex = intercept[Exception] {
      ExpSmooth.smooth(df, "g", "i", "x", 3, 10, maxPoints = 5, preCheck = false)
        .write.format("noop").mode("overwrite").save()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("exceeds 5 points"), ex.getMessage)
  }
}
