package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Behavioral invariants for the round-9 curation/eval queries that a
  * hash-match oracle alone can't state: multi-probe LSH must DOMINATE
  * single-probe (superset candidates → recall can only go up), and the
  * one-number reports must stay in their mathematical ranges. */
class CurationOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("multi-probe ANN dominates single-probe: results are a superset in quality") {
    // q32 = exact-bucket LSH, q188 = bucket + all 1-bit flips. For
    // every query id, q188's top-k cosine at each rank is >= q32's at
    // the same rank (more candidates can only improve the top-k).
    val single = SparkEntry.queries("q32_ann_lsh")(spark, dir)
      .select(col("q_id"), col("rank"), col("cos_sim").as("cos_single"))
    val multi = SparkEntry.queries("q188_multiprobe_ann")(spark, dir)
      .select(col("q_id"), col("rank"), col("cos_sim").as("cos_multi"))
    val joined = single.join(multi, Seq("q_id", "rank"))
    val violations = joined.filter(col("cos_multi") < col("cos_single")).count()
    violations shouldBe 0L
    // and multi-probe finds at least as many neighbors overall
    multi.count() should be >= single.count()
  }

  test("recall ladder: multiprobe dominates single, candidate volume buys recall") {
    // q202's three rungs probe the same decorrelated hyperplane space;
    // multiprobe's candidate set is a strict superset of single's, so
    // its macro recall cannot be lower, and every rung must pay for
    // recall with candidates (avg_cand weakly increasing with recall
    // within the bucket family)
    val rows = SparkEntry.queries("q202_recall_ladder")(spark, dir)
      .orderBy("method").collect()
    // the full 3-schemes x {raw, centered} matrix
    rows.length shouldBe 6
    val byMethod = rows.map(r => r.getAs[String]("method") ->
      (r.getAs[Double]("avg_cand"), r.getAs[Double]("macro_recall"))).toMap
    for ((_, (c, r)) <- byMethod) {
      r should be >= 0.0; r should be <= 1.0; c should be >= 0.0
    }
    byMethod("2_multiprobe")._2 should be >= byMethod("1_single")._2
    byMethod("2_multiprobe")._1 should be >= byMethod("1_single")._1
    // the superset argument holds within the centered family too
    byMethod("5_multiprobe_centered")._2 should be >=
      byMethod("4_single_centered")._2
    byMethod("5_multiprobe_centered")._1 should be >=
      byMethod("4_single_centered")._1
  }

  test("one-number reports stay in range: gini in [0,1), recall/precision in [0,1]") {
    val g = SparkEntry.queries("q195_user_gini")(spark, dir).collect()(0)
    val gini = g.getAs[Double]("gini")
    gini should be >= 0.0
    gini should be < 1.0
    val r = SparkEntry.queries("q175_lsh_recall")(spark, dir).collect()(0)
    for (c <- Seq("recall", "precision")) {
      r.getAs[Double](c) should be >= 0.0
      r.getAs[Double](c) should be <= 1.0
    }
  }

  test("curation recipe is a true funnel: every stage shrinks or holds") {
    val stages = SparkEntry.queries("q200_curation_recipe")(spark, dir)
      .orderBy("stage").collect()
    stages.length shouldBe 6
    val docs = stages.map(_.getAs[Long]("n_docs"))
    docs.zip(docs.tail).foreach { case (prev, next) =>
      next should be <= prev
    }
  }

  test("retention can only re-admit: the post-RTBF funnel is a superset") {
    // A theorem for q296's victim sets, pinned across the two gates:
    // withdrawing an eval suite only SHRINKS the live gram set, so
    // contamination quarantines can only lift; forgetting embeddings
    // only shrinks pair-graph components, so for a surviving vector
    // kept = (v == min(component)) can only flip false -> true (its
    // new component is a subset of the old one that still contains v,
    // and if v was the min of the old set it is the min of any such
    // subset). Canonical flag, quality score, and the eval holdout
    // read the untouched documents table. Hence q296 (post-retention
    // funnel) must contain every q295 (pre-retention) training doc.
    val before = SparkEntry.queries("q295_maintained_funnel")(spark, dir)
      .select("doc_id")
    val after = SparkEntry.queries("q296_funnel_retention")(spark, dir)
      .select("doc_id")
    before.join(after, Seq("doc_id"), "left_anti").count() shouldBe 0L
    after.count() should be >= before.count()
  }
}
