package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 900 rows of one hot key + a long tail, joined to a 4-row dim
  private def fixtures = {
    val fact = ((1 to 900).map(i => (i.toLong, "hot")) ++
      (901 to 960).map(i => (i.toLong, s"k${i % 3}")))
      .toDF("row_id", "key")
    val dim = Seq(("hot", 10), ("k0", 20), ("k1", 30), ("k2", 40))
      .toDF("key", "weight")
    (fact, dim)
  }

  test("saltedJoin returns exactly the unsalted inner join") {
    val (fact, dim) = fixtures
    val plain = fact.join(dim, "key")
      .select("row_id", "key", "weight").as[(Long, String, Int)]
      .collect().sorted.toSeq
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 8,
        spreadOn = Seq("row_id"))
      .select("row_id", "key", "weight").as[(Long, String, Int)]
      .collect().sorted.toSeq
    salted shouldBe plain
  }

  test("the hot key actually spreads across salt buckets") {
    val (fact, _) = fixtures
    val saltCol = pmod(xxhash64(col("key"), col("row_id")), lit(8L))
    val buckets = fact.filter(col("key") === "hot")
      .select(saltCol.as("salt")).distinct().count()
    buckets should be > 4L // 900 rows over 8 buckets: all 8 in practice
  }

  test("salting is deterministic: re-evaluation yields identical salts") {
    val (fact, dim) = fixtures
    val a = Skew.saltedJoin(fact, dim, "key", 8, Seq("row_id")).collect()
    val b = Skew.saltedJoin(fact, dim, "key", 8, Seq("row_id")).collect()
    a.sortBy(_.getLong(1)).toSeq shouldBe b.sortBy(_.getLong(1)).toSeq
  }

  test("hotKeys surfaces only keys at or above the threshold") {
    val (fact, _) = fixtures
    val hot = Skew.hotKeys(fact, "key", threshold = 100)
      .as[(String, Long)].collect().toMap
    hot shouldBe Map("hot" -> 900L)
  }

  test("saltedJoinHotOnly returns exactly the unsalted inner join") {
    val (fact, dim) = fixtures
    val plain = fact.join(dim, "key")
      .select("row_id", "key", "weight").as[(Long, String, Int)]
      .collect().sorted.toSeq
    val targeted = Skew.saltedJoinHotOnly(fact, dim, "key", salts = 8,
        spreadOn = Seq("row_id"), hotThreshold = 100)
      .select("row_id", "key", "weight").as[(Long, String, Int)]
      .collect().sorted.toSeq
    targeted shouldBe plain
  }

  test("saltedJoinHotOnly replicates only the hot slice of the dim") {
    val (fact, dim) = fixtures
    // only "hot" (900 rows) crosses threshold=100; k0/k1/k2 stay cold
    val hot = Skew.hotKeys(fact, "key", threshold = 100)
    val (dimHot, dimCold) = Skew.splitByHot(dim, "key", hot)
    // the slice that pays the salts-x replication is 1 row, not 4
    dimHot.count() shouldBe 1L
    dimHot.select("key").as[String].collect().toSeq shouldBe Seq("hot")
    // the cold 3/4 of the dim takes the plain join, unreplicated
    dimCold.count() shouldBe 3L
  }

  test("saltedJoinHotOnly with no hot keys degenerates to the plain join") {
    val (fact, dim) = fixtures
    val out = Skew.saltedJoinHotOnly(fact, dim, "key", salts = 8,
        spreadOn = Seq("row_id"), hotThreshold = 100000)
      .select("row_id", "key", "weight").as[(Long, String, Int)]
      .collect().sorted.toSeq
    val plain = fact.join(dim, "key")
      .select("row_id", "key", "weight").as[(Long, String, Int)]
      .collect().sorted.toSeq
    out shouldBe plain
  }
}
