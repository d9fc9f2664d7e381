package graft.llm

import graft.SparkSpec

/** Chat audit: clean transcripts pass, each violation trips its flag,
  * malformed JSON nulls the facts.
  */
class ChatAuditSpec extends SparkSpec {

  import spark.implicits._

  private def one(js: String) = {
    val df = Seq((1L, js)).toDF("id", "js")
    ChatAudit.audit(df, "id", "js").head()
  }

  test("clean transcript with leading system passes every check") {
    val r = one("""[{"role":"system","content":"s"},
      {"role":"user","content":"hi"},
      {"role":"assistant","content":"yo"}]""".replaceAll("\n\\s*", ""))
    assert(r.getAs[Boolean]("parse_ok"))
    assert(r.getAs[Long]("n_turns") == 3L)
    assert(r.getAs[Boolean]("roles_ok") && r.getAs[Boolean]("sys_ok") &&
      r.getAs[Boolean]("alt_ok") && r.getAs[Boolean]("ends_ok"))
    assert(r.getAs[Long]("n_empty") == 0L)
    assert(r.getAs[Long]("total_chars") == 5L)
  }

  test("systemless user/assistant transcript also alternates cleanly") {
    val r = one("""[{"role":"user","content":"q"},{"role":"assistant","content":"a"}]""")
    assert(r.getAs[Boolean]("alt_ok") && r.getAs[Boolean]("sys_ok") &&
      r.getAs[Boolean]("ends_ok"))
  }

  test("each violation trips exactly its flag") {
    val midSys = one(
      """[{"role":"user","content":"q"},{"role":"system","content":"s"}]""")
    assert(!midSys.getAs[Boolean]("sys_ok"))
    val doubleUser = one(
      """[{"role":"user","content":"q"},{"role":"user","content":"q2"}]""")
    assert(!doubleUser.getAs[Boolean]("alt_ok") &&
      !doubleUser.getAs[Boolean]("ends_ok"))
    val badRole = one(
      """[{"role":"tool","content":"x"},{"role":"assistant","content":"a"}]""")
    assert(!badRole.getAs[Boolean]("roles_ok"))
    val missingRole = one(
      """[{"content":"x"},{"role":"assistant","content":"a"}]""")
    assert(!missingRole.getAs[Boolean]("roles_ok"))
    val empty = one(
      """[{"role":"user","content":"  "},{"role":"assistant","content":"a"}]""")
    assert(empty.getAs[Long]("n_empty") == 1L)
  }

  test("malformed or non-array JSON fails parse and nulls the facts") {
    for (bad <- Seq("""[{"role":"user"""", "\"scalar\"", "[]")) {
      val r = one(bad)
      assert(!r.getAs[Boolean]("parse_ok"), bad)
      assert(r.isNullAt(r.fieldIndex("n_turns")), bad)
      assert(r.isNullAt(r.fieldIndex("alt_ok")), bad)
    }
  }
}
