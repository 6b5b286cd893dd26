package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Dedup.bloomPrefilteredAntiJoin]]'s contract is EQUALITY with the
  * plain anti-join — the Bloom prefilter may only change the plan, never
  * the rows. The q113 gate proves it against the DuckDB `NOT EXISTS`
  * oracle on the corpus; this spec proves it on synthetic corpora with
  * REAL duplicate keys (which the testdata lacks) and pins the two
  * defining Bloom properties: no false negatives (a true dup can never
  * sneak past the prefilter) and bounded false positives (the suspect
  * set stays near the true-dup rate, so the avoided shuffle is real).
  */
class BloomDedupSpec extends SparkSpec {

  import spark.implicits._

  test("bloom-prefiltered anti-join equals the plain anti-join, dups and all") {
    // 60% of batch keys exist in state: plenty of true dups AND
    // definite-new rows, so both paths carry rows
    val state = (0 until 600).map(i => (i.toLong, s"key$i")).toDF("sid", "k")
    val batch = (0 until 1000).map(i => (i.toLong + 10000, s"key${i % 1000}"))
      .toDF("bid", "k")

    val plain = batch.join(state.select("k").distinct(), Seq("k"), "left_anti")
    val bloomed = Dedup.bloomPrefilteredAntiJoin(batch, state, "k",
      expectedItems = 1000L, fpp = 0.01)

    bloomed.count() shouldBe plain.count()
    bloomed.select("bid").exceptAll(plain.select("bid")).count() shouldBe 0
    plain.select("bid").exceptAll(bloomed.select("bid")).count() shouldBe 0
    // survivors are exactly the keys state never saw
    bloomed.select("k").as[String].collect().foreach { k =>
      k.drop(3).toInt should be >= 600
    }
  }

  test("no false negatives: every true duplicate is dropped even at high fpp") {
    val state = (0 until 200).map(i => (i.toLong, s"dup$i")).toDF("sid", "k")
    val batch = (0 until 200).map(i => (i.toLong + 5000, s"dup$i")).toDF("bid", "k")
    // a sloppy filter (fpp=0.5) may mark extra suspects but can never
    // let a real dup through — the exact join behind it catches all
    val out = Dedup.bloomPrefilteredAntiJoin(batch, state, "k",
      expectedItems = 200L, fpp = 0.5)
    out.count() shouldBe 0L
  }

  test("long keys probe the long hash domain: equality with the plain anti-join") {
    // r6 ADVICE: the UDF-era probe cast numeric keys to string and
    // hashed the wrong domain — every member looked 'definitely new'
    // and duplicates survived. The native probe branches on dtype.
    val state = (0 until 500).map(i => (i.toLong, i.toLong * 7)).toDF("sid", "k")
    val batch = (0 until 1000).map(i => (i.toLong + 10000, i.toLong * 7))
      .toDF("bid", "k")
    val plain = batch.join(state.select("k").distinct(), Seq("k"), "left_anti")
    val bloomed = Dedup.bloomPrefilteredAntiJoin(batch, state, "k",
      expectedItems = 500L, fpp = 0.01)
    bloomed.count() shouldBe plain.count()
    bloomed.select("bid").exceptAll(plain.select("bid")).count() shouldBe 0
    plain.select("bid").exceptAll(bloomed.select("bid")).count() shouldBe 0
  }

  test("non-string, non-integral keys are rejected up front") {
    val state = Seq((1L, 1.5d)).toDF("sid", "k")
    val batch = Seq((2L, 2.5d)).toDF("bid", "k")
    an[IllegalArgumentException] should be thrownBy
      Dedup.bloomPrefilteredAntiJoin(batch, state, "k")
  }

  test("the suspect fraction tracks true-dup rate + fpp, so the prefilter pays") {
    // 10% true dups at 1% fpp: the exact anti-join should see ~11% of
    // the batch, not all of it — the shuffle the op exists to avoid
    val state = (0 until 1000).map(i => (i.toLong, s"s$i")).toDF("sid", "k")
    val batch = (0 until 2000).map { i =>
      val k = if (i % 10 == 0) s"s${i / 10}" else s"new$i"
      (i.toLong + 50000, k)
    }.toDF("bid", "k")
    val bf = state.stat.bloomFilter("k", 1000L, 0.01)
    val suspects = batch.collect().count(r => bf.mightContainString(r.getString(1)))
    suspects.toDouble / 2000 should be < 0.15
    suspects should be >= 200 // all 200 true dups are suspects
  }
}
