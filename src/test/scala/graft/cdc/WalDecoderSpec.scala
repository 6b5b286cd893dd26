package graft.cdc

import graft.SparkSpec

/** Decode + route semantics against the reference's own sample WAL lines
  * (reference: src/sinker/sinker.py:110-119 comment block and
  * tests/test_bulk_action_generator.py). */
class WalDecoderSpec extends SparkSpec {

  private val mvInsert =
    """table sinker.foo_mv: INSERT: id[text]:'a-1' doc[json]:'{"name" : "Foo Bar"}'"""
  private val parentDelete =
    """table public."Foo": DELETE: id[text]:'91754ea9-2983-4cf7-bdf9-fc23d2386d90'"""
  private val mvDeleteNoTuple = "table sinker.foo_mv: DELETE: (no-tuple-data)"

  test("MV INSERT line decodes with quote-stripped doc payload") {
    val ev = WalDecoder.decode(17393L, "0/24EDA4D8", mvInsert).get
    ev.schema shouldBe "sinker"
    ev.table shouldBe "foo_mv"
    ev.op shouldBe "INSERT"
    ev.id shouldBe "a-1"
    ev.doc shouldBe Some("""{"name" : "Foo Bar"}""")
  }

  test("parent-table DELETE with quoted mixed-case table and uuid id") {
    val ev = WalDecoder.decode(17393L, "0/24EDA4D8", parentDelete).get
    ev.schema shouldBe "public"
    ev.table shouldBe "Foo"
    ev.op shouldBe "DELETE"
    ev.id shouldBe "91754ea9-2983-4cf7-bdf9-fc23d2386d90"
    ev.doc shouldBe None
  }

  test("MV DELETE (no-tuple-data), BEGIN and COMMIT lines don't match") {
    WalDecoder.decode(1, "0/1", mvDeleteNoTuple) shouldBe None
    WalDecoder.decode(1, "0/1", "BEGIN 17393") shouldBe None
    WalDecoder.decode(1, "0/1", "COMMIT 17393") shouldBe None
  }

  test("payload containing the marker truncates identically in both paths (reference split[1])") {
    import spark.implicits._
    val line =
      """table sinker.m_mv: INSERT: id[text]:'x-1' doc[json]:'{"t": "see doc[json]: syntax"}'"""
    val scalar = WalDecoder.decode(1L, "0/9", line).get.doc.get
    val viaDf = WalDecoder.decodeDf(Seq((1L, "0/9", line)).toDF("xid", "lsn", "data"))
      .select("doc").first().getString(0)
    viaDf shouldBe scalar
    scalar shouldBe """{"t": "see """ // cut at the 2nd marker, quotes stripped
  }

  test("decodeDf + route: view INSERT → index, parent DELETE → delete, rest dropped") {
    import spark.implicits._
    val wal = Seq(
      (17393L, "0/1", "BEGIN 17393"),
      (17393L, "0/2", mvInsert),
      (17393L, "0/3", parentDelete),
      (17393L, "0/4", mvDeleteNoTuple),
      (17393L, "0/5", "table public.unrelated: INSERT: id[text]:'x-9'"),
      (17393L, "0/6", "COMMIT 17393")
    ).toDF("xid", "lsn", "data")

    val decoded = WalDecoder.decodeDf(wal)
    decoded.count() shouldBe 3 // insert, parent delete, unrelated insert

    val actions = Router.route(decoded,
      viewsToIndices = Map("foo_mv" -> "foos"),
      parentTablesToIndices = Map("Foo" -> "foos"))
      .orderBy("lsn").collect()
    actions.length shouldBe 2
    actions(0).getString(0) shouldBe "index"
    actions(0).getString(1) shouldBe "foos"
    actions(0).getString(2) shouldBe "a-1"
    actions(0).getString(3) shouldBe """{"name" : "Foo Bar"}"""
    actions(1).getString(0) shouldBe "delete"
    actions(1).getString(1) shouldBe "foos"
    actions(1).getString(2) shouldBe "91754ea9-2983-4cf7-bdf9-fc23d2386d90"
    actions(1).isNullAt(3) shouldBe true
  }
}
