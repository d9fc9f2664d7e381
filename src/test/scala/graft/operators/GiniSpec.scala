package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gini contracts: perfect equality -> 0, total concentration -> (n-1)/n,
  * hand-checked middle case, empty/zero-total NULLs, partitioning
  * independence.
  */
class GiniSpec extends SparkSpec {

  import spark.implicits._

  private def g(vals: Long*): (Long, Long, Option[Long]) = {
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val r = Gini.gini(df, "v", "id").collect().head
    (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))
  }

  test("perfect equality gives exactly zero") {
    assert(g(5L, 5L, 5L, 5L) == ((4L, 20L, Some(0L))))
  }

  test("total concentration gives (n-1)/n") {
    // x = (0,0,0,10): G = (2*4*10 - 5*10)/(4*10) = 30/40 = 0.75
    assert(g(0L, 0L, 0L, 10L) == ((4L, 10L, Some(750000L))))
  }

  test("hand-checked middle case") {
    // ascending (1,2,3,4): G = (2*(1+4+9+16) - 5*10)/(4*10) = 10/40 = 0.25
    assert(g(3L, 1L, 4L, 2L) == ((4L, 10L, Some(250000L))))
  }

  test("empty input and all-zero totals give NULL gini") {
    assert(g() == ((0L, 0L, None)))
    assert(g(0L, 0L) == ((2L, 0L, None)))
  }

  test("partitioning independence (ties ordered by id)") {
    val vals = (1L to 500L).map(i => (i, (i * 37) % 50))
    def run(p: Int) = Gini.gini(vals.toDF("id", "v").repartition(p), "v", "id")
      .collect().head.getLong(2)
    assert(run(1) == run(7))
  }
}
