package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refZ(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue2 matches the bit-interleave reference, masking high bits") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (12345L, 54321L),
      (65535L, 65535L), (70000L, 3L), (3L, 70000L),
      (-1L, 0L), (-5L, -7L)) // negatives degrade to their low bits too
    val got = cases.toDF("a", "b")
      .select(Layout.zValue2(col("a"), col("b"), 16).as("z"))
      .as[Long].collect().toSeq
    got shouldBe cases.map { case (a, b) => refZ(a & 65535L, b & 65535L, 16) }
  }

  test("zorder: partition z-ranges are disjoint and BOTH dims prune") {
    // balanced 8-bit × 8-bit grid: both dims occupy the same bit width,
    // the precondition zValue2/scaleTo document
    val grid = spark.range(256L * 256L)
      .select((col("id") / 256).cast("long").as("a"),
        (col("id") % 256).cast("long").as("b"))
    val laid = Layout.zorder(grid, col("a"), col("b"), 8, 16)
    val ranges = laid
      .withColumn("z2", Layout.zValue2(col("a"), col("b"), 8))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("z2").as("lo"), max("z2").as("hi"),
        min("a").as("alo"), min("b").as("blo"))
      .orderBy("pid")
      .as[(Int, Long, Long, Long, Long)].collect()
    ranges.length shouldBe 16
    // range partitioning: ascending, non-overlapping z intervals
    ranges.sliding(2).foreach {
      case Array(prev, next) => assert(prev._3 <= next._2,
        s"z ranges overlap: partition ${prev._1} hi=${prev._3} vs ${next._1} lo=${next._2}")
      case _ =>
    }
    // pruning on EITHER dimension: a 1/16 slice of each dim touches a
    // strict subset of partitions (a date-sorted layout would spread a
    // key slice across every partition)
    def touched(dim: String, cut: Long): Long = laid
      .withColumn("pid", spark_partition_id())
      .filter(col(dim) < cut)
      .select(countDistinct(col("pid"))).as[Long].first()
    val aHits = touched("a", 16)
    val bHits = touched("b", 16)
    assert(aHits < 16, s"a-slice touched all partitions ($aHits)")
    assert(bHits < 16, s"b-slice touched all partitions ($bHits)")
  }

  test("globalNtile matches the window ntile exactly, ragged remainders included") {
    import org.apache.spark.sql.expressions.Window
    // 103 % 10 = 3: the first three tiles must carry the extra row
    val df = (0 until 103).map(i => ((i * 37) % 103, i.toLong)).toDF("v", "id")
    for (tiles <- Seq(1, 4, 10)) {
      val fast = Layout.globalNtile(df, tiles, col("v").asc, col("id").asc)
        .select(col("id"), col("tile"))
      val window = df.select(col("id"),
        ntile(tiles).over(Window.orderBy(col("v").asc, col("id").asc)).as("tile"))
      withClue(s"tiles=$tiles: ") {
        fast.exceptAll(window).count() shouldBe 0
        window.exceptAll(fast).count() shouldBe 0
      }
    }
    // fewer rows than tiles: every row its own tile, like ntile
    val tiny = (0 until 3).map(i => (i, i.toLong)).toDF("v", "id")
    Layout.globalNtile(tiny, 10, col("v").asc).select("tile")
      .as[Int].collect().sorted shouldBe Array(1, 2, 3)
  }

  test("scaleTo: clamps and spreads a numeric range onto the bit budget") {
    val vals = Seq(-5.0, 0.0, 50.0, 100.0, 250.0).toDF("v")
      .select(Layout.scaleTo(col("v"), 0.0, 100.0, 8).as("s"))
      .as[Long].collect().toSeq
    vals.head shouldBe 0L    // below lo clamps
    vals.last shouldBe 255L  // above hi clamps
    vals(2) shouldBe 127L    // midpoint lands mid-range
    assert(vals == vals.sorted, "scaling must be monotonic")
  }

  test("weightedPrioritySample matches the brute-force rank and is reproducible") {
    val docs = (1L to 200L).map(i => (i, 1L + (i * 7) % 50))
      .toDF("id", "w")
    val got = Layout.weightedPrioritySample(docs, "id", "w", 10)
      .as[(Long, Long, Double)].collect().toSeq
    // brute force with the identical hash → uniform → ln(u)/w chain
    val md = java.security.MessageDigest.getInstance("MD5")
    def score(id: Long, w: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val h = java.lang.Long.parseLong(hex, 16)
      BigDecimal(math.log((h + 1) / 281474976710656.0) / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = (1L to 200L).map(i => (i, 1L + (i * 7) % 50))
      .map { case (i, w) => (i, w, score(i, w)) }
      .sortBy { case (i, _, s) => (-s, i) }.take(10)
    got shouldBe expect
    // deterministic: a second run draws the identical set
    Layout.weightedPrioritySample(docs, "id", "w", 10)
      .as[(Long, Long, Double)].collect().toSeq shouldBe got
    // bias sanity: mean weight of the draw exceeds the population mean
    val popMean = (1L to 200L).map(i => 1L + (i * 7) % 50).sum / 200.0
    got.map(_._2).sum / 10.0 should be > popMean
  }
}
