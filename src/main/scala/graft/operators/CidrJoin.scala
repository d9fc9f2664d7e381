package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CIDR longest-prefix-match enrichment — the log-pipeline join that
  * attaches network metadata (ASN, datacenter, office, threat list) to
  * raw IPv4 traffic: each fact row's address matches every network
  * whose prefix covers it, and the MOST SPECIFIC (longest prefix) wins,
  * the routing-table rule. A naive implementation is a non-equi range
  * join (BroadcastNestedLoop at best); here it is an EQUI-join: every
  * network lands in the /`BandBits` bucket(s) it covers (networks at
  * least as specific as the band land in exactly one; coarser networks
  * expand dim-side into their 2^(BandBits−len) buckets — bounded,
  * declared, and tiny next to the fact table), facts bucket by one
  * shift, and in-bucket candidates filter on the prefix compare and
  * collapse to the longest prefix with one partial-agg'd struct-max.
  *
  * Dim-table discipline (curated config, so errors RAISE, never skip):
  * malformed CIDR strings, out-of-range octets, prefix lengths outside
  * [0, 32], set host bits (10.1.2.3/8 — a typo'd network), and
  * duplicate (network, length) rows all raise in-plan. Fact-side
  * addresses are DATA: a NULL or out-of-range address simply doesn't
  * match (NULL enrichment, never a dropped row).
  *
  * Scale shape: facts shuffle ONCE on (bucket) — or not at all when
  * the network table broadcasts (it almost always does); the argmax is
  * per-fact-row partial-agg'd; no nested-loop plan anywhere
  * (spec-pinned). 100 TB posture: band the join at /8 (256 buckets
  * spread fine after AQE); a routing table of millions of nets is
  * still MBs broadcast.
  */
object CidrJoin {

  /** Band width in bits — /8 buckets. */
  val BandBits = 8
  private val BandShift = 32 - BandBits

  /** Dotted-quad string → numeric address in [0, 2³²); NULL when
    * malformed (fact-side data convention). Strict: exactly four
    * decimal octets 0–255, no padding tolerance beyond leading zeros.
    */
  def ipv4ToLong(c: Column): Column = {
    val p = split(c, "\\.")
    val octetsOk = size(p) === 4 &&
      (0 to 3).map(i => element_at(p, i + 1).rlike("^[0-9]{1,3}$") &&
        element_at(p, i + 1).cast("int") <= 255).reduce(_ && _)
    when(c.isNotNull && octetsOk,
      (0 to 3).map(i => element_at(p, i + 1).cast("long") *
        lit(1L << (8 * (3 - i)))).reduce(_ + _))
  }

  /** Enrichment map: one row per MATCHED fact id — (idCol, payloads*,
    * matched_net, matched_len). Facts with no covering network are
    * absent (left-join the map to keep them; [[enrich]] does).
    * `nets` carries `cidrCol` ("a.b.c.d/len") plus payload columns.
    */
  def matchMap(facts: DataFrame, idCol: String, ipCol: String,
               nets: DataFrame, cidrCol: String,
               payloadCols: Seq[String]): DataFrame = {
    graft.Guards.requireIntegral(facts, ipCol, "cidrJoin")
    val parts = split(col(cidrCol), "/")
    val netIp = ipv4ToLong(element_at(parts, 1))
    val lenRaw = element_at(parts, 2)
    val lenOk = lenRaw.rlike("^[0-9]{1,2}$") && lenRaw.cast("int") <= 32
    val hostMask = when(col("__len") === 32, lit(0L))
      .otherwise(call_function("shiftleft", lit(1L),
        (lit(32) - col("__len")).cast("int")) - 1L)
    val perNet = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__net"), col("__len"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val parsed = nets
      .withColumn("__net",
        when(size(parts) === 2 && netIp.isNotNull && lenOk, netIp)
          .otherwise(raise_error(concat(
            lit("cidrJoin: malformed CIDR '"), col(cidrCol).cast("string"),
            lit("' in the network table — curated config must parse")))))
      .withColumn("__len", lenRaw.cast("long"))
      .withColumn("__net",
        when(col("__net").bitwiseAND(hostMask) =!= 0L,
          raise_error(concat(lit("cidrJoin: host bits set in '"),
            col(cidrCol), lit("' — not a network address"))))
          .otherwise(col("__net")))
      .withColumn("__dup", count(lit(1)).over(perNet))
      .withColumn("__net",
        when(col("__dup") > 1L,
          raise_error(concat(lit("cidrJoin: duplicate network '"),
            col(cidrCol), lit("' — (net, len) must be unique"))))
          .otherwise(col("__net")))
    // bucket expansion: one bucket when len >= BandBits, else the
    // 2^(BandBits-len) covered buckets (dim-side, bounded by 2^BandBits)
    val banded = parsed
      .withColumn("__bucket", explode(
        when(col("__len") >= BandBits,
          array(shiftright(col("__net"), BandShift)))
          .otherwise(sequence(
            shiftright(col("__net"), BandShift),
            shiftright(col("__net"), BandShift) +
              call_function("shiftleft", lit(1L),
                (lit(BandBits) - col("__len")).cast("int")) - 1L))))
      .select((Seq(col("__bucket"), col("__net"), col("__len")) ++
        payloadCols.map(col)): _*)
    val f = facts
      .where(col(ipCol).isNotNull && col(ipCol).cast("long") >= 0L &&
        col(ipCol).cast("long") < (1L << 32))
      .select(col(idCol), col(ipCol).cast("long").as("__ip"))
    val cand = f.join(broadcast(banded),
      shiftright(col("__ip"), BandShift) === col("__bucket") &&
        call_function("shiftright", col("__ip"),
          (lit(32) - col("__len")).cast("int")) ===
          call_function("shiftright", col("__net"),
            (lit(32) - col("__len")).cast("int")))
    val best = cand.groupBy(col(idCol))
      .agg(max(struct((Seq(col("__len"), col("__net")) ++
        payloadCols.map(col)): _*)).as("__m"))
    best.select((Seq(col(idCol)) ++
      payloadCols.map(c => col(s"__m.$c").as(c)) ++
      Seq(col("__m.__net").as("matched_net"),
        col("__m.__len").as("matched_len"))): _*)
  }

  /** Facts left-joined with their longest-prefix enrichment — every
    * fact row survives; unmatched rows carry NULL payloads.
    */
  def enrich(facts: DataFrame, idCol: String, ipCol: String,
             nets: DataFrame, cidrCol: String,
             payloadCols: Seq[String]): DataFrame = {
    val m = matchMap(facts, idCol, ipCol, nets, cidrCol, payloadCols)
      .withColumnRenamed(idCol, "__mid")
    facts.join(m, col(idCol) <=> col("__mid"), "left").drop("__mid")
  }

  /** DuckDB replay — the textbook correlated form: every covering
    * network ranked by prefix length, longest kept via QUALIFY.
    * `factsSql` yields (id, ip); `netsSql` yields (cidr, payloads*).
    */
  def matchMapOracle(factsSql: String, netsSql: String, idName: String,
                     payloadCols: Seq[String]): String = {
    val pay = payloadCols.map(c => s"n.$c").mkString(", ")
    s"""WITH nets AS (
  SELECT ${payloadCols.mkString(", ")},
    CAST(string_split(string_split(cidr, '/')[1], '.')[1] AS BIGINT) * 16777216
      + CAST(string_split(string_split(cidr, '/')[1], '.')[2] AS BIGINT) * 65536
      + CAST(string_split(string_split(cidr, '/')[1], '.')[3] AS BIGINT) * 256
      + CAST(string_split(string_split(cidr, '/')[1], '.')[4] AS BIGINT) AS net,
    CAST(string_split(cidr, '/')[2] AS BIGINT) AS len
  FROM ($netsSql)),
f AS (SELECT id, ip FROM ($factsSql)
  WHERE ip IS NOT NULL AND ip >= 0 AND ip < 4294967296)
SELECT f.id AS $idName, $pay, n.net AS matched_net, n.len AS matched_len
FROM f JOIN nets n ON (f.ip >> (32 - n.len)) = (n.net >> (32 - n.len))
QUALIFY row_number() OVER (PARTITION BY f.id ORDER BY n.len DESC, n.net DESC) = 1
ORDER BY f.id"""
  }
}
