package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[CharEntropy]] kernel semantics: known closed-form values, the
  * quality-filter ordering it exists for (spam < prose < random), and
  * codegen/null behavior. The cross-engine exactness is q114's gate. */
class CharEntropySpec extends SparkSpec {

  import spark.implicits._

  private def entropy(s: String): Double =
    CharEntropy.compute(org.apache.spark.unsafe.types.UTF8String.fromString(s))

  test("closed forms: empty and single-char strings are 0 bits; uniform pairs are 1") {
    entropy("") shouldBe 0.0
    entropy("aaaaaaaa") shouldBe 0.0 +- 1e-6
    entropy("abababab") shouldBe 1.0 +- 1e-6 // two equiprobable symbols
    entropy("abcdabcd") shouldBe 2.0 +- 1e-6 // four equiprobable symbols
  }

  test("orders corpora the quality filter expects: spam < prose < random") {
    val spam = entropy("aaaa aaaa aaaa aaaa aaaa")
    val prose = entropy("the quick brown fox jumps over the lazy dog")
    val random = entropy("q8Zp3kV9sLxT2mWb7RcJ1nFy5HdG0uEa")
    spam should be < prose
    prose should be < random
  }

  test("counts code points, not UTF-16 units: astral chars are one symbol") {
    // U+1F600 is a surrogate pair in UTF-16; 4 identical emoji = 0 bits
    entropy("😀😀😀😀") shouldBe 0.0 +- 1e-6
    // mixed non-ASCII exercises the fallback map path
    entropy("éé😀😀") shouldBe 1.0 +- 1e-6
  }

  test("expression path: codegen column agrees with the kernel, null-safe") {
    val df = Seq(Some("abababab"), Some("zzzz"), None).toDF("t")
    val out = df.select(CharEntropy(col("t")).as("e"))
      .as[Option[Double]].collect()
    out(0).get shouldBe 1.0 +- 1e-6
    out(1).get shouldBe 0.0 +- 1e-6
    out(2) shouldBe None
  }
}
