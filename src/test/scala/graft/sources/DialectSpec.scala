package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Read-side type-map contract (reference X5 per-driver type registry):
  * dialect-specific width/zone semantics must not decay silently.
  */
class DialectSpec extends AnyFunSuite {

  test("base map covers the standard names") {
    val d = Dialect.Ansi
    assert(d.sparkTypeFor("INTEGER") == IntegerType)
    assert(d.sparkTypeFor("BIGINT") == LongType)
    assert(d.sparkTypeFor("VARCHAR(255)") == StringType)
    assert(d.sparkTypeFor("DECIMAL(18,2)") == DecimalType(18, 2))
    assert(d.sparkTypeFor("REAL") == FloatType)
    assert(d.sparkTypeFor("unknown_exotic") == StringType)
  }

  test("zone-qualified timestamps keep zone semantics") {
    val d = Dialect.Postgres
    assert(d.sparkTypeFor("TIMESTAMP WITH TIME ZONE") == TimestampType)
    assert(d.sparkTypeFor("timestamp with time zone") == TimestampType)
    assert(d.sparkTypeFor("TIMESTAMPTZ") == TimestampType)
    // plain TIMESTAMP stays zone-less
    assert(d.sparkTypeFor("TIMESTAMP") == TimestampNTZType)
    assert(d.sparkTypeFor("TIMESTAMP(6)") == TimestampNTZType)
  }

  test("MySQL bare FLOAT is a 4-byte single; Postgres FLOAT is float8") {
    assert(Dialect.MySql.sparkTypeFor("FLOAT") == FloatType)
    assert(Dialect.MySql.sparkTypeFor("float(10,2)") == FloatType)
    assert(Dialect.Postgres.sparkTypeFor("FLOAT") == DoubleType)
    assert(Dialect.Ansi.sparkTypeFor("FLOAT") == DoubleType)
  }
}
