package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII plumbing contracts: hand-checked counts per pattern, redaction
  * order (email before IPv4, id before phone), NULL handling, and the
  * zero-shuffle scan-stage plan.
  */
class PiiSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (1L, "mail me at a.b+c@ex-ample.co.uk or x@y.io thanks"),
    (2L, "server 10.0.0.1 and 192.168.255.254 up, version 1.2.3 is not an ip"),
    (3L, "ssn 123-45-6789 phone +44-201-555-0199 plain 555-0199 stays"),
    (4L, "nothing sensitive here"),
    (5L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("hand-checked counts per pattern") {
    val got = Pii.piiCounts(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(1L) == ((2L, 0L, 0L, 0L, 2L)))
    // "version 1.2.3" has three octets only — not an IPv4 hit
    assert(got(2L) == ((0L, 2L, 0L, 0L, 2L)))
    assert(got(3L) == ((0L, 0L, 1L, 1L, 2L)))
    assert(got(4L) == ((0L, 0L, 0L, 0L, 0L)))
    assert(!got.contains(5L)) // NULL text dropped
  }

  test("redaction replaces every hit with its typed placeholder, in order") {
    val got = Pii.redactDocs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "mail me at [EMAIL] or [EMAIL] thanks")
    assert(got(2L) == "server [IP] and [IP] up, version 1.2.3 is not an ip")
    assert(got(3L) == "ssn [ID] phone [PHONE] plain 555-0199 stays")
    assert(got(4L) == "nothing sensitive here")
    assert(got(5L) == null) // NULL text rides through as NULL
  }

  test("a dotted-quad inside an email host redacts as EMAIL, not IP") {
    val d = Seq((1L, "odd but real: user@10.0.0.1.example.com then 10.0.0.1"))
      .toDF("doc_id", "text")
    val got = Pii.redactDocs(d, "doc_id", "text").collect().head.getString(1)
    assert(got == "odd but real: [EMAIL] then [IP]")
  }

  test("plan: pure scan stage — zero exchanges, no aggregation") {
    val plan = Pii.piiCounts(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Aggregate"), plan)
  }
}
