package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: language id, quality
  * scoring, token counting. All per-row codegen'd expressions — zero
  * shuffles, zero UDFs; aggregation is whatever the caller groups by.
  */
object TextAnalysis {

  /** Tokenize on a literal delimiter — `Pattern.quote`d because
    * Spark's `split` treats it as a regex (see [[Dedup.words]]). */
  def words(text: Column, delim: String = " "): Column =
    split(text, java.util.regex.Pattern.quote(delim))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish token count: alpha runs, digit runs, and single
    * non-alphanumeric marks each count as one token — a cheap stand-in
    * for subword tokenizers when budgeting training data. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Tiny per-language function-word lists for the n-gram-free stopword
    * heuristic. Real deployments swap in full lists; the mechanics —
    * per-row set membership counting, argmax across languages — don't
    * change. */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我"))

  /** Fraction of tokens that appear in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(words(text), w => array_contains(sw, w))).cast("double") /
      greatest(tokenCount(text), lit(1))
  }

  /** Language id by stopword-hit argmax; ties and zero-hit texts fall
    * back to "und" (undetermined). */
  def langId(text: Column): Column = {
    val scored = StopwordSets.map { case (lang, sw) =>
      struct(stopwordRatio(text, sw).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** BM25 relevance of every document against a fixed bag of query
    * `terms` (Robertson/Sparck Jones; the Okapi k1/b form) — the lexical
    * ranking half of a retrieval pipeline, as a pure DataFrame plan:
    *
    *  - per-row term frequencies and doc length are codegen'd array
    *    expressions (no explode for the tf side);
    *  - corpus statistics (N, avgdl, per-term document frequency) are
    *    ONE aggregate row, broadcast back via a 1-row cross join — the
    *    idf table every search engine keeps in memory;
    *  - the score folds terms left-to-right in a fixed order, so the
    *    arithmetic reproduces bit-for-bit in any engine that evaluates
    *    the same expression tree (the oracle's `ln` and `/` are the
    *    same libm doubles).
    *
    * Output: (idCol, dl, score). Compose `.orderBy(desc)` + `limit`
    * for top-k (TakeOrderedAndProject — no global sort at scale).
    */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val withTf = docs
      .select(col(idCol), words(col(textCol)).as("__ws"))
      .select(
        col(idCol) +:
          size(col("__ws")).cast("long").as("dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            size(filter(col("__ws"), w => w === lit(t))).cast("long").as(s"tf$i")
          }: _*)
    val statCols =
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl") +:
        terms.indices.map(i => count(when(col(s"tf$i") > 0, 1)).as(s"df$i"))
    val stats = withTf.agg(count(lit(1)).as("n_docs"), statCols: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val idf = log(
        ((col("n_docs") - col(s"df$i")).cast("double") + lit(0.5)) /
          (col(s"df$i").cast("double") + lit(0.5)) + lit(1.0))
      val inner = lit(1.0) - lit(b) +
        lit(b) * (col("dl").cast("double") / col("avgdl"))
      // (k1 + 1) folds INSIDE the plan (constant-folded in double) so an
      // oracle writing `1.2 + 1` lands on the identical double literal
      idf * ((col(s"tf$i").cast("double") * (lit(k1) + lit(1.0))) /
        (col(s"tf$i").cast("double") + lit(k1) * inner))
    }.reduce(_ + _)
    scored.select(col(idCol), col("dl"), score.as("score"))
  }

  /** Top-`topN` TF-IDF terms per document — the classic keyword
    * extractor (salient-term summaries, topic tagging, index pruning).
    *
    * 100 TB shape:
    *  - term frequencies are ONE (id, word) groupBy over the exploded
    *    corpus (partial aggregation collapses repeats map-side);
    *  - document frequencies reuse that tf table (a second keyed
    *    groupBy over doc-distinct terms — never a re-scan of the raw
    *    text), so the vocabulary stays distributed, exactly like the
    *    unigram-LM path (q72);
    *  - the corpus doc count is a 1-row broadcast;
    *  - top-N per doc is a per-doc window, partitioned by the id.
    *
    * Determinism: score = tf · ln(N/df) — an exact BIGINT times one
    * libm `ln` call on the same double in any engine; ties rank by term
    * text ascending.
    *
    * Output: (idCol, term, tf, rank, score). */
  def tfidfTopTerms(docs: DataFrame, textCol: String, idCol: String,
      topN: Int): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col(idCol), col("term"), col("tf"),
        col("rank"), round(col("score"), 6).as("score"))
  }

  /** Bigram collocations by pointwise mutual information — the
    * phrase-mining pass a tokenizer-training / vocab-curation pipeline
    * runs over a corpus: PMI(w1,w2) = ln( p(w1,w2) / (p(w1)·p(w2)) )
    * with bigram probability over all bigrams and unigram probabilities
    * over all tokens. `minCount` guards the low-count PMI explosion (a
    * hapax pair has near-maximal PMI by construction); `topN` returns
    * the strongest collocations, ties broken by the words.
    *
    * Scale shape: two keyed aggregations (bigram counts, unigram
    * counts) over one corpus pass each, the two corpus totals ride a
    * 1-row broadcast, and the unigram re-joins are keyed by word —
    * vocabulary-sized, never corpus-sized. Top-N plans as
    * TakeOrderedAndProject (per-partition top, driver merge).
    *
    * Determinism: counts are exact BIGINTs; the PMI double is one
    * division tree plus one libm `ln` — bit-identical across engines on
    * the same expression shape (the q49/q72/q82 discipline); ordering
    * uses the ROUNDED score so oracle sorts can't diverge on sub-1e-6
    * noise, then (w1, w2).
    *
    * Output: (w1, w2, c12, pmi), strongest first. */
  def bigramPmi(docs: DataFrame, textCol: String,
      minCount: Long, topN: Int): DataFrame = {
    val ws = words(col(textCol))
    val uni = docs.select(explode(ws).as("wd"))
      .groupBy(col("wd")).agg(count(lit(1)).as("cu"))
    val bg = docs.select(ws.as("ws"))
      .select(explode(expr(
        """CASE WHEN size(ws) >= 2
          | THEN transform(sequence(0, size(ws) - 2),
          |        i -> struct(ws[i] AS w1, ws[i + 1] AS w2))
          | ELSE CAST(array() AS array<struct<w1:string,w2:string>>)
          | END""".stripMargin)).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    // corpus totals: one row, broadcast (explicit hint so the plan
    // shape doesn't depend on AQE detecting the 1-row side)
    val tot = bg.agg(count(lit(1)).as("nb"))
      .crossJoin(broadcast(uni.agg(sum(col("cu")).as("nw"))))
    bc
      .join(uni.select(col("wd").as("w1"), col("cu").as("cu1")), Seq("w1"))
      .join(uni.select(col("wd").as("w2"), col("cu").as("cu2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("pmi", round(log(
        (col("c12").cast("double") / col("nb").cast("double")) /
          ((col("cu1").cast("double") / col("nw").cast("double")) *
            (col("cu2").cast("double") / col("nw").cast("double")))), 6))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(topN)
      .select(col("w1"), col("w2"), col("c12"), col("pmi"))
  }

  /** Per-source document-length histogram — the length-distribution
    * report every curation run ships (and the input to length-based
    * quality cuts): counts per `bucketWidth`-char bucket plus the
    * bucket's observed min/max. Exact integer bucket arithmetic
    * (`div`, not floating floor — no double-rounding flicker at bucket
    * edges); one partial-aggregated groupBy, output bounded by
    * sources × buckets. */
  def lengthHistogram(docs: DataFrame, lenCol: String, groupCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    docs.groupBy(col(groupCol),
        expr(s"$lenCol div $bucketWidth * $bucketWidth").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(lenCol)).as("lo"), max(col(lenCol)).as("hi"))
  }

  /** Accent-strip translate table: NFC-composed Latin accents common
    * in web corpora → ASCII. Applied AFTER NFC (so decomposed
    * e+combining-acute first composes to é, then strips to e) and
    * AFTER lower (one case to map). Characters outside the table pass
    * through unchanged. */
  val AccentFrom = "àáâãäåèéêëìíîïòóôõöùúûüçñ"
  val AccentTo = "aaaaaaeeeeiiiiooooouuuucn"

  /** Canonical text normalization — the first pass of every dedup /
    * curation pipeline (é-as-one-codepoint and é-as-e+accent must hash
    * identically): lowercase → Unicode NFC (native codegen kernel
    * [[graft.functions.NfcNormalize]] with an ASCII fast path) →
    * accent strip (one `translate`) → whitespace collapse → trim.
    * Entirely per-row codegen'd expressions, zero shuffle — composes
    * in front of a corpus scan for free. Engine-portable: DuckDB
    * spells the identical chain with its own `nfc_normalize` (oracle
    * q103). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      translate(graft.functions.NfcNormalize(lower(text)), AccentFrom, AccentTo),
      "\\s+", " "))

  /** PII scrubbing patterns, ordered most- to least-specific so one
    * pass per pattern composes safely (an email is redacted before its
    * digit run could be). All three stay inside RE2-compatible syntax
    * (no backrefs/lookarounds) so any engine mirroring the pipeline —
    * including the DuckDB oracle — matches byte-for-byte. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9]{1,3}[-. (]{1,2}[0-9]{3}[-. )]{1,2}[0-9]{3}[-. ]?[0-9]{4}"
  val DigitRunPattern = "[0-9]{4,}"

  /** Redact PII-looking spans with `token`: each pattern is one
    * codegen'd `regexp_replace` (global), applied in order. Per-row,
    * zero shuffle — the shape you want in front of a 100 TB corpus
    * scan. Callers with stricter compliance needs pass their own
    * pattern list; the default covers emails, NANP-ish phone numbers,
    * and ≥4-digit identifier runs. */
  def redactPii(text: Column,
      patterns: Seq[String] = Seq(EmailPattern, PhonePattern, DigitRunPattern),
      token: String = "<PII>"): Column =
    patterns.foldLeft(text)((c, p) => regexp_replace(c, p, token))

  /** Fixed-size token chunking with overlap — how documents become
    * training sequences / retrieval passages. Each doc explodes into
    * windows of `chunkTokens` words advancing by `chunkTokens -
    * overlap`; a trailing partial chunk is emitted whenever it carries
    * at least one token beyond the previous chunk's coverage (no token
    * is ever dropped), and suppressed when it would hold only the
    * overlap region already present. Per-row explode + slice: zero
    * shuffles, output size ∝ corpus / stride — embarrassingly parallel
    * at any scale.
    *
    * Output: (idCol, chunk_id, start_tok, chunk_text, n_toks).
    */
  def chunk(docs: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"need chunkTokens > overlap >= 0, got $chunkTokens/$overlap")
    val stride = chunkTokens - overlap
    docs
      .select(col(idCol), words(col(textCol)).as("__ws"))
      .select(col(idCol), col("__ws"),
        explode(sequence(lit(0),
          greatest(size(col("__ws")) - (overlap + 1), lit(0)),
          lit(stride))).as("start_tok"))
      .select(col(idCol),
        (col("start_tok") / stride).cast("long").as("chunk_id"),
        col("start_tok").cast("long").as("start_tok"),
        concat_ws(" ",
          slice(col("__ws"), col("start_tok") + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), size(col("__ws")) - col("start_tok"))
          .cast("long").as("n_toks"))
  }

  /** The high-frequency function words every quality heuristic keys on:
    * natural English prose carries a stable share of them; machine
    * gibberish, keyword stuffing, and non-prose (tables, code, logs)
    * carry almost none. */
  val Stopwords: Seq[String] = Seq(
    "a", "the", "of", "to", "and", "in", "is", "it", "that", "for")

  /** Stopword ratio — the Gopher-rule prose filter ([[qualityScore]]
    * covers length/punct/word-length bands; this adds the
    * function-word signal): fraction of whitespace tokens that are
    * [[Stopwords]]. Per-row codegen'd array filter over an inline
    * literal list (10 entries — no broadcast, no shuffle); composes
    * into any corpus scan for free. */
  def stopwordRatio(text: Column): Column = {
    val stops = array(Stopwords.map(lit): _*)
    round(
      size(filter(words(text), t => array_contains(stops, t)))
        .cast("double") / size(words(text)), 6)
  }

  /** N-gram novelty: the fraction of a document's DISTINCT word
    * `k`-shingles whose corpus-wide FIRST owner (minimum doc id) is
    * this document — ≈1 for original prose, →0 for quote posts,
    * mirrors, and template chains. The curation-side complement to
    * pairwise near-dup detection: no pairs are ever materialized, so
    * cost is linear in shingle volume even when duplication is rampant.
    *
    * Scale shape: shingling is per-row codegen (explode of a
    * transform/slice chain); the first-owner table is one
    * shingle-keyed aggregation (`min` partial-aggregates map-side —
    * a boilerplate shingle's row is a single long); the flag join
    * re-keys on the shingle the aggregate just shuffled, then one
    * doc-keyed rollup. Same inverted-index discipline as
    * [[graft.ops.Dedup.boilerplateStats]]; at 100 TB hash the shingle
    * to a 64-bit key before the wide exchanges.
    *
    * Output: (idCol, n_shingles, novelty_frac) — docs shorter than
    * `k` tokens carry no shingles and are absent. */
  def ngramNovelty(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // stage the split as a materialized column first — the lambda
    // re-eval trap: a `words(...)` expression closed over by the
    // transform lambda re-splits the text per shingle
    val ws = col("__ws")
    val grams = when(size(ws) >= k,
      transform(sequence(lit(1), size(ws) - (k - 1)),
        i => concat_ws(" ", slice(ws, i, lit(k)))))
      .otherwise(array().cast("array<string>"))
    val sh = docs
      .select(col(idCol), words(col(textCol)).as("__ws"))
      .select(col(idCol), explode(array_distinct(grams)).as("g"))
    val own = sh.groupBy(col("g")).agg(min(col(idCol)).as("__first"))
    sh.join(own, Seq("g"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("__first") === col(idCol), 1L).otherwise(0L))
          .as("__own"))
      .select(col(idCol), col("n_shingles"),
        round(col("__own").cast("double") / col("n_shingles"), 6)
          .as("novelty_frac"))
  }

  /** Composite quality score in [0,1]: length band + punctuation ratio +
    * mean word length band — the standard cheap filters applied before
    * expensive model-based scoring. */
  def qualityScore(text: Column, nChars: Column): Column = {
    val nTokens = tokenCount(text)
    val punct = size(filter(
      transform(words(text), w => substring(w, 1, 1)),
      c => !c.rlike("[A-Za-z0-9]"))).cast("double") /
      greatest(nTokens, lit(1))
    val meanWordLen = nChars.cast("double") / greatest(nTokens, lit(1))
    val lenBand = when(nChars.between(100, 400), 1.0d)
      .when(nChars.between(50, 99) || nChars.between(401, 600), 0.5d)
      .otherwise(0.0d)
    val wordBand = when(meanWordLen.between(3.0, 8.0), 1.0d).otherwise(0.5d)
    round((lenBand + wordBand + (lit(1.0d) - least(punct * 4, lit(1.0d)))) / 3.0d, 4)
  }
}
