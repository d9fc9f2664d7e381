package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  /** Well-separated synthetic corpus: 3 cluster centers in 16-dim, tight
    * noise — the regime where a correct PQ must retrieve cluster mates.
    */
  private lazy val clustered = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(3)(Array.fill(16)(rnd.nextGaussian() * 10f))
    (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq, i % 3)
    }.toDF("vec_id", "embedding", "cluster")
  }

  test("codes are in range and rebuilds are deterministic") {
    val pq = ProductQuantizer.fit(clustered, m = 4, ksub = 8)
    val pq2 = ProductQuantizer.fit(clustered, m = 4, ksub = 8)
    val c1 = pq.encode(clustered, "vec_id", "embedding")
      .orderBy("vec_id").as[(Long, Seq[Int])].collect()
    val c2 = pq2.encode(clustered, "vec_id", "embedding")
      .orderBy("vec_id").as[(Long, Seq[Int])].collect()
    assert(c1.toSeq === c2.toSeq, "same seed must yield identical codes")
    c1.foreach { case (_, cs) =>
      assert(cs.length === 4)
      cs.foreach(c => assert(c >= 0 && c < 8))
    }
  }

  test("ADC retrieves cluster mates on separable data") {
    val pq = ProductQuantizer.fit(clustered, m = 4, ksub = 8)
    val codes = pq.encode(clustered, "vec_id", "embedding")
    val queries = clustered.where(col("vec_id") < 6)
    val got = pq.search(codes, queries, k = 10)
      .join(clustered.select(col("vec_id").as("neighbor_id"), col("cluster").as("n_cluster")), "neighbor_id")
      .join(clustered.select(col("vec_id").as("query_id"), col("cluster").as("q_cluster")), "query_id")
    val agree = got.where(col("n_cluster") === col("q_cluster")).count()
    val total = got.count()
    assert(total === 6L * 10)
    // tight clusters, 0.1 noise vs 10-unit spread: essentially all top-10
    // neighbors must come from the query's own cluster
    assert(agree >= total * 9 / 10, s"cluster agreement $agree/$total")
  }

  test("sampled fit (trainFraction) still retrieves cluster mates; tiny samples fall back") {
    // codebooks are opaque to encode/ADC, so a sampled fit exercises exactly
    // the same search path — recall on separable data is the correctness bar
    val pq = ProductQuantizer.fit(clustered, m = 4, ksub = 8, trainFraction = 0.5)
    val codes = pq.encode(clustered, "vec_id", "embedding")
    val queries = clustered.where(col("vec_id") < 6)
    val got = pq.search(codes, queries, k = 10)
      .join(clustered.select(col("vec_id").as("neighbor_id"), col("cluster").as("n_cluster")), "neighbor_id")
      .join(clustered.select(col("vec_id").as("query_id"), col("cluster").as("q_cluster")), "query_id")
    val agree = got.where(col("n_cluster") === col("q_cluster")).count()
    val total = got.count()
    assert(total === 6L * 10)
    assert(agree >= total * 9 / 10, s"cluster agreement $agree/$total")
    // a fraction too small to seed ksub centroids falls back to the full
    // frame — and must then equal the unsampled fit exactly (same seed,
    // same data, same layout)
    val tiny = ProductQuantizer.fit(clustered, m = 4, ksub = 8, trainFraction = 0.001)
    val full = ProductQuantizer.fit(clustered, m = 4, ksub = 8)
    assert(tiny.codebooks.flatten.flatten.toSeq === full.codebooks.flatten.flatten.toSeq)
  }

  test("grid codebook: encode matches per-row argmin over the codebook") {
    val pq = ProductQuantizer.gridCodebook(m = 4, subDim = 4, ksub = 8, lo = -0.5, hi = 0.5)
    val rows = pq.encode(clustered, "vec_id", "embedding")
      .join(clustered, "vec_id").where(col("vec_id") < 12)
      .select("vec_id", "codes", "embedding").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](2)
      val codes = r.getSeq[Int](1)
      (0 until pq.m).foreach { s =>
        val dists = pq.codebooks(s).map { c =>
          (0 until pq.subDim).map { j =>
            val t = v(s * pq.subDim + j) - c(j); t * t
          }.sum
        }
        assert(codes(s) == dists.indexOf(dists.min),
          s"vec ${r.getLong(0)} subspace $s: code ${codes(s)} vs argmin ${dists.indexOf(dists.min)}")
      }
    }
  }

  test("encode and ADC yield NULL on dimension mismatch, never a silent prefix") {
    import spark.implicits._
    val pq = ProductQuantizer.gridCodebook(m = 4, subDim = 4, ksub = 4, lo = -0.5, hi = 0.5)
    // 8-dim vector against a 16-dim codebook: phantom zero-padding would
    // produce plausible-looking garbage codes — must be NULL instead
    val bad = Seq((1L, Seq.fill(8)(0.1f))).toDF("vec_id", "embedding")
    assert(pq.encode(bad, "vec_id", "embedding").select("codes").head().isNullAt(0))
    // over-LONG vectors are a mismatch too (the oracle length-filters both
    // directions), and a ragged codebook must never read past the vector
    val long = Seq((1L, Seq.fill(20)(0.1f))).toDF("vec_id", "embedding")
    assert(pq.encode(long, "vec_id", "embedding").select("codes").head().isNullAt(0))
    val ragged = graft.functions.PqEncode(col("embedding"),
      Array(Array(Array.fill(3)(0.0)), Array(Array.fill(5)(0.0))))
    val rag = Seq((1L, Seq.fill(6)(0.1f))).toDF("vec_id", "embedding")
      .select(ragged.as("codes"))
    assert(rag.head().isNullAt(0))
    // short codes array against m=4 tables: prefix-summing would rank the
    // corrupt row artificially near every query — must be NULL instead
    val tables = Map(7L -> Array.fill(4)(Array.fill(4)(1.0)))
    val shortCodes = Seq((7L, Seq(0, 1))).toDF("qid", "codes")
    val d = shortCodes.select(
      graft.functions.AdcDist(col("qid"), col("codes"), tables).as("d"))
    assert(d.head().isNullAt(0))
  }

  test("oversized query frame fails fast instead of collecting to the driver") {
    val pq = ProductQuantizer.gridCodebook(m = 4, subDim = 4, ksub = 8, lo = -0.5, hi = 0.5)
    val codes = pq.encode(clustered, "vec_id", "embedding")
    spark.conf.set(ProductQuantizer.MaxQueryRowsKey, "10")
    try {
      val e = intercept[IllegalStateException] {
        pq.search(codes, clustered, k = 3) // 90 queries > 10
      }
      assert(e.getMessage.contains(ProductQuantizer.MaxQueryRowsKey))
      // within the bound the search runs normally
      assert(pq.search(codes, clustered.where(col("vec_id") < 5), k = 3).count() === 15)
    } finally spark.conf.unset(ProductQuantizer.MaxQueryRowsKey)
  }

  test("ADC distance orders identical vectors first") {
    val pq = ProductQuantizer.fit(clustered, m = 4, ksub = 8)
    val codes = pq.encode(clustered, "vec_id", "embedding")
    // vec 0's nearest compressed neighbors: ids 3, 6, … (same cluster);
    // its own ADC distance to itself is excluded by the != filter, so just
    // check the top hit shares the cluster and has a tiny distance
    val top = pq.search(codes, clustered.where(col("vec_id") === 0), k = 1).head()
    assert(top.getAs[Long]("neighbor_id") % 3 === 0L)
    assert(top.getAs[Double]("adc_dist") < 1.0)
  }
}
