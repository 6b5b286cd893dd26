package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Dedup, Freq, Graphs, Layout, Multimodal, Similarity, TextAnalysis}

/** Training-data-pipeline operators under the CORRECTNESS gate: dedup
  * (exact, fingerprint, MinHash-LSH, SimHash), similarity search (brute
  * force + LSH), text analysis, and multimodal metadata — all over the
  * driver's `documents`/`embeddings` tables, each with a DuckDB oracle
  * recomputing identical md5/double arithmetic.
  */
object LlmQueries {

  type Q = (SparkSession, String) => DataFrame

  private[queries] val Bands = 4
  private[queries] val RowsPerBand = 4
  private[queries] val ShingleK = 3
  private[queries] val JaccardThreshold = 0.5
  private[queries] val AnnK = 5
  private[queries] val LshPlanes = 6

  // shared oracle fragments ------------------------------------------------
  private[queries] val WsSplit = "string_split(text, ' ')"
  /** DuckDB word k-shingle list (guarded like the Spark side). */
  private[queries] def shinglesSqlK(k: Int): String = {
    val terms = (0 until k).map(j => s"$WsSplit[i+$j]").mkString(" || ' ' || ")
    s"""CASE WHEN len($WsSplit) >= $k
       | THEN list_transform(range(1, len($WsSplit) - ${k - 2}), i -> $terms)
       | ELSE [] END""".stripMargin.replace("\n", " ")
  }
  private[queries] val ShinglesSql = shinglesSqlK(ShingleK)
  private def minhashSql(h: Int) =
    s"list_min(list_transform(hs, p -> p[1] + $h * p[2]))"
  private def bandKeySql(b: Int) = {
    val parts = (0 until RowsPerBand).map(r => s"mh${b * RowsPerBand + r}::VARCHAR")
    s"md5(${parts.mkString(" || '|' || ")})"
  }
  /** The full minhash-banding CTE chain over `k`-shingles. */
  private[queries] def bandsCteK(k: Int): String = {
    val mhCols = (0 until Bands * RowsPerBand)
      .map(h => s"${minhashSql(h)} AS mh$h").mkString(", ")
    val bandSelects = (0 until Bands).map(b =>
      s"SELECT doc_id, $b AS band, ${bandKeySql(b)} AS band_key FROM mh")
      .mkString(" UNION ALL ")
    s"""sh AS (SELECT doc_id, ${shinglesSqlK(k)} AS sh FROM documents),
       |hp AS (SELECT doc_id, list_transform(sh, s ->
       |         [('0x' || substr(md5(s), 1, 12))::BIGINT,
       |          ('0x' || substr(md5(s), 13, 12))::BIGINT]) AS hs
       |       FROM sh WHERE len(sh) > 0),
       |mh AS (SELECT doc_id, $mhCols FROM hp),
       |bands AS ($bandSelects)""".stripMargin
  }
  private[queries] val BandsCte = bandsCteK(ShingleK)

  // --------------------------------------------------------- q26
  /** Exact dedup: content hash + canonical flag (min id per hash). */
  private def q26(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(Tables.documents(s, dir), "text", "doc_id")
      .select(col("doc_id"), col("content_key"), col("is_canonical"))
  private val q26Sql =
    """SELECT doc_id, md5(text) AS content_key,
      |  ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1 AS is_canonical
      |FROM documents""".stripMargin

  // --------------------------------------------------------- q27
  /** MinHash banded LSH keys: (doc_id, band, band_key). */
  private def q27(s: SparkSession, dir: String): DataFrame =
    Dedup.bandKeys(Tables.documents(s, dir), "text", "doc_id",
        Bands, RowsPerBand, ShingleK)
      .select(col("id").as("doc_id"), col("band"), col("band_key"))
  private val q27Sql =
    s"WITH $BandsCte SELECT doc_id, band, band_key FROM bands"

  // --------------------------------------------------------- q28
  /** Near-dup pairs: LSH candidates verified by exact token Jaccard. */
  private def q28(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // persist the signatures: the candidate self-join reads them twice,
    // and recomputing 16 minhashes per side doubles the dominant cost
    // (band keys are ~bands×n tiny rows — cheap to keep, at any scale)
    val bands = Dedup
      .bandKeys(docs, "text", "doc_id", Bands, RowsPerBand, ShingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup.candidatePairs(bands)
    Dedup.jaccardVerify(pairs, docs, "text", "doc_id", JaccardThreshold)
  }
  private val q28Sql =
    s"""WITH $BandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct($WsSplit) AS toks FROM documents)
       |SELECT id_a, id_b,
       |  round(len(list_intersect(sa.toks, sb.toks))::DOUBLE /
       |        len(list_distinct(list_concat(sa.toks, sb.toks))), 4) AS jaccard
       |FROM pairs JOIN sets sa ON id_a = sa.doc_id JOIN sets sb ON id_b = sb.doc_id
       |WHERE len(list_intersect(sa.toks, sb.toks))::DOUBLE /
       |      len(list_distinct(list_concat(sa.toks, sb.toks))) >= $JaccardThreshold""".stripMargin

  // --------------------------------------------------------- q29
  /** Fingerprint (sorted distinct token set) clusters of size > 1. */
  private def q29(s: SparkSession, dir: String): DataFrame =
    Dedup.fingerprintClusters(Tables.documents(s, dir), "text", "doc_id")
  private val q29Sql =
    s"""SELECT md5(array_to_string(list_sort(list_distinct($WsSplit)), ' ')) AS fingerprint,
       |  COUNT(*) AS cluster_size, MIN(doc_id) AS canonical_doc
       |FROM documents GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin

  // --------------------------------------------------------- q30
  /** 16-bit SimHash per document (fused native kernel). */
  private def q30(s: SparkSession, dir: String): DataFrame = {
    val base = Dedup.spread(
      Tables.documents(s, dir).select(col("doc_id"), col("text")))
    base.select(col("doc_id"),
      Dedup.simhash16Native(base, Dedup.words(col("text"))).as("simhash"))
  }
  private val q30Sql = {
    val bitTerms = (0 until 16).map { b =>
      val digit = b / 4 + 1
      val shift = b % 4
      val bitSum =
        s"""list_sum(list_transform($WsSplit, w ->
           | CASE WHEN ((strpos('0123456789abcdef', substr(md5(w), $digit, 1)) - 1) >> $shift) & 1 = 1
           | THEN 1 ELSE -1 END))""".stripMargin.replace("\n", " ")
      s"CASE WHEN $bitSum > 0 THEN ${1L << b} ELSE 0 END"
    }
    s"SELECT doc_id, CAST(${bitTerms.mkString(" + ")} AS BIGINT) AS simhash FROM documents"
  }

  // --------------------------------------------------------- q31
  /** Exact brute-force cosine top-k (queries = vec_id < 10). */
  private def q31(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    Similarity.topKNeighbors(emb, queries, AnnK)
  }
  private[queries] val CosSql =
    "list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v)))"
  private val q31Sql =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT q_id, CAST(rn AS INT) AS rank, vec_id, round(cos, 6) AS cos_sim FROM (
       |  SELECT q_id, vec_id, $CosSql AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY $CosSql DESC, vec_id) AS rn
       |  FROM q, c WHERE vec_id <> q_id)
       |WHERE rn <= $AnnK""".stripMargin

  // --------------------------------------------------------- q32
  /** LSH-bucketed approximate top-k: candidates share the query's
    * hyperplane-sign bucket; cosine only within buckets. */
  private def q32(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    Similarity.topKNeighborsLsh(emb, queries, AnnK, LshPlanes)
  }
  private[queries] val BucketSql = {
    // frequency scaled by p — must stay in lockstep with
    // Similarity.planeWeights' decorrelated-planes formula
    val bits = (1 to LshPlanes).map { p =>
      s"""CASE WHEN list_sum(list_transform(range(0, len(e)),
         | d -> e[d + 1]::DOUBLE * sin($p * 12.9898 + d * 78.233 * $p))) >= 0
         | THEN '1' ELSE '0' END""".stripMargin.replace("\n", " ")
    }
    bits.mkString(" || ")
  }
  private val q32Sql =
    s"""WITH base AS (SELECT vec_id, embedding AS e, embedding::DOUBLE[] AS vd FROM embeddings),
       |b AS (SELECT vec_id, vd, $BucketSql AS bucket FROM base),
       |q AS (SELECT vec_id AS q_id, vd AS qv, bucket FROM b WHERE vec_id < 10),
       |c AS (SELECT vec_id, vd AS v, bucket FROM b)
       |SELECT q_id, CAST(rn AS INT) AS rank, vec_id, round(cos, 6) AS cos_sim FROM (
       |  SELECT q_id, vec_id, $CosSql AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY $CosSql DESC, vec_id) AS rn
       |  FROM q JOIN c USING (bucket) WHERE vec_id <> q_id)
       |WHERE rn <= $AnnK""".stripMargin

  // --------------------------------------------------------- q33
  /** Language id: stopword-hit argmax vs the labeled lang column. */
  private def q33(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
  private val q33Sql = {
    // Spark's greatest(struct(score, lang)) tie-breaks by MAX lang string;
    // DuckDB 1.0 greatest can't take structs, so the CASE checks langs in
    // descending lexicographic order for identical semantics.
    val scoreCols = TextAnalysis.StopwordSets.map { case (lang, sw) =>
      val swList = sw.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter($WsSplit, w -> list_contains($swList, w)))::DOUBLE / greatest(len($WsSplit), 1) AS s_$lang"
    }
    val langsDesc = TextAnalysis.StopwordSets.map(_._1).sorted.reverse
    val best = s"greatest(${TextAnalysis.StopwordSets.map(l => s"s_${l._1}").mkString(", ")})"
    val pick = langsDesc.init
      .map(l => s"WHEN s_$l = $best THEN '$l'")
      .mkString(" ")
    s"""SELECT doc_id, lang,
       |  CASE WHEN $best = 0 THEN 'und' $pick ELSE '${langsDesc.last}' END AS lang_pred
       |FROM (SELECT doc_id, lang, ${scoreCols.mkString(", ")} FROM documents)""".stripMargin
  }

  // --------------------------------------------------------- q34
  /** Quality scoring: length/punct/word-length composite. */
  private def q34(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.qualityScore(col("text"), col("n_chars")).as("quality"))
  private val q34Sql =
    s"""SELECT doc_id, n_chars, n_tokens, round((len_band + word_band + (1.0 - least(punct * 4, 1.0))) / 3.0, 4) AS quality
       |FROM (
       |  SELECT doc_id, n_chars, CAST(len($WsSplit) AS INT) AS n_tokens,
       |    len(list_filter(list_transform($WsSplit, w -> substr(w, 1, 1)),
       |        c -> NOT regexp_matches(c, '[A-Za-z0-9]')))::DOUBLE
       |      / greatest(len($WsSplit), 1) AS punct,
       |    CASE WHEN n_chars BETWEEN 100 AND 400 THEN 1.0
       |         WHEN n_chars BETWEEN 50 AND 99 OR n_chars BETWEEN 401 AND 600 THEN 0.5
       |         ELSE 0.0 END AS len_band,
       |    CASE WHEN n_chars::DOUBLE / greatest(len($WsSplit), 1) BETWEEN 3.0 AND 8.0
       |         THEN 1.0 ELSE 0.5 END AS word_band
       |  FROM documents)""".stripMargin

  // --------------------------------------------------------- q35
  /** Token counting: whitespace + BPE-ish regex. */
  private def q35(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
        TextAnalysis.tokenCountRegex(col("text")).as("n_bpe_tokens"))
  private val q35Sql =
    s"""SELECT doc_id, CAST(len($WsSplit) AS INT) AS n_ws_tokens,
       |  CAST(len(regexp_extract_all(text, '${TextAnalysis.BpeTokenPattern}')) AS INT) AS n_bpe_tokens
       |FROM documents""".stripMargin

  // --------------------------------------------------------- q36
  /** Multimodal metadata over binary blobs: byte length + sha256. The
    * decode/feature step is the [[Multimodal]] mapPartitions path
    * (spec-tested); metadata extraction is oracle-checked here. */
  private def q36(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFromDocuments(Tables.documents(s, dir))
      .select(col("id").as("doc_id"), col("mime"),
        length(col("blob")).as("byte_len"),
        sha2(col("blob"), 256).as("sha"))
  private val q36Sql =
    """SELECT doc_id, 'application/x-src-' || source AS mime,
      |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
      |  sha256(text) AS sha
      |FROM documents""".stripMargin

  // --------------------------------------------------------- q37
  /** Embedding-cosine near-dup pairs: banded hyperplane LSH candidates
    * verified at cosine ≥ 0.4 (the corpus' high-similarity tail). */
  private val NdBands = 3
  private val NdPlanes = 3
  private val NdThreshold = 0.4
  private def q37(s: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(Tables.embeddings(s, dir),
      NdBands, NdPlanes, NdThreshold)
  private val q37Sql = {
    val bandSelects = (0 until NdBands).map { b =>
      val bits = (1 to NdPlanes).map { r =>
        val p = b * NdPlanes + r
        s"""CASE WHEN list_sum(list_transform(range(0, len(e)),
           | d -> e[d + 1]::DOUBLE * sin($p * 12.9898 + d * 78.233 * $p))) >= 0
           | THEN '1' ELSE '0' END""".stripMargin.replace("\n", " ")
      }
      s"SELECT vec_id, $b AS band, ${bits.mkString(" || ")} AS bucket FROM base"
    }
    s"""WITH base AS (SELECT vec_id, embedding AS e FROM embeddings),
       |keys AS (${bandSelects.mkString(" UNION ALL ")}),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM keys a JOIN keys b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |vecs AS (SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings)
       |SELECT id_a, id_b, round(cos, 6) AS cos_sim FROM (
       |  SELECT id_a, id_b,
       |    list_dot_product(va.vv, vb.vv) /
       |      (sqrt(list_dot_product(va.vv, va.vv)) * sqrt(list_dot_product(vb.vv, vb.vv))) AS cos
       |  FROM pairs JOIN vecs va ON id_a = va.vec_id JOIN vecs vb ON id_b = vb.vec_id)
       |WHERE cos >= $NdThreshold""".stripMargin
  }

  // --------------------------------------------------------- q38
  /** SimHash dedup clusters (identical-signature blocking). */
  private def q38(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashClusters(Tables.documents(s, dir), "text", "doc_id")
      .select(col("simhash"), col("cluster_size"),
        col("canonical_doc").cast("long").as("canonical_doc"))
  private val q38Sql = {
    val simhashBody = q30Sql.stripPrefix("SELECT doc_id, ")
      .stripSuffix(" FROM documents")
    s"""WITH sigs AS (SELECT doc_id, $simhashBody FROM documents)
       |SELECT simhash, COUNT(*) AS cluster_size, MIN(doc_id) AS canonical_doc
       |FROM sigs GROUP BY simhash HAVING COUNT(*) > 1""".stripMargin
  }

  // --------------------------------------------------------- q39
  /** End-to-end dedup keep-policy: a doc is dropped when it's the
    * higher id of any verified near-dup pair (greedy canonical-keeps —
    * deterministic, one anti-join; no iterative connected components
    * needed for a keep/drop decision). Reports per-source retention. */
  private def q39(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bands = Dedup
      .bandKeys(docs, "text", "doc_id", Bands, RowsPerBand, ShingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dropped = Dedup
      .jaccardVerify(Dedup.candidatePairs(bands), docs, "text", "doc_id",
        JaccardThreshold)
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("is_dropped", lit(true))
    // fold both counts in ONE aggregation pass over docs (the previous
    // anti-join + two groupBys + rejoin scanned docs twice and shuffled
    // thrice); no broadcast hint — dropped scales with the near-dup
    // rate, so AQE decides per run (a storm-heavy corpus must not OOM)
    docs.join(dropped, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("is_dropped").isNull, 1)).as("n_kept"))
      .select(col("source"), col("n_docs"), col("n_kept"))
  }
  private val q39Sql =
    s"""WITH $BandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct($WsSplit) AS toks FROM documents),
       |dropped AS (
       |  SELECT DISTINCT id_b AS doc_id
       |  FROM pairs JOIN sets sa ON id_a = sa.doc_id JOIN sets sb ON id_b = sb.doc_id
       |  WHERE len(list_intersect(sa.toks, sb.toks))::DOUBLE /
       |        len(list_distinct(list_concat(sa.toks, sb.toks))) >= $JaccardThreshold)
       |SELECT source, COUNT(*) AS n_docs,
       |  COUNT(*) FILTER (doc_id NOT IN (SELECT doc_id FROM dropped)) AS n_kept
       |FROM documents GROUP BY source""".stripMargin

  // --------------------------------------------------------- q40
  /** Event sessionization: 30-minute-gap sessions per user via running
    * gap-count windows — one shuffle on user_id, the batch shape of the
    * streaming mapGroupsWithState sessionizer. Microsecond-exact gap
    * arithmetic keeps both engines identical. */
  private def q40(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("gap",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("gap")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
  }
  private val q40Sql =
    """SELECT user_id, session_id, COUNT(*) AS n_events, MIN(ts) AS session_start
      |FROM (
      |  SELECT user_id, ts,
      |    CAST(SUM(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
      |           THEN 1 ELSE 0 END AS gap
      |    FROM (
      |      SELECT user_id, ts, event_id,
      |        LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |      FROM events)))
      |GROUP BY user_id, session_id""".stripMargin

  // --------------------------------------------------------- q42
  /** The multimodal DECODE path under the oracle: blobs flow through
    * the typed mapPartitions batch decoder (Multimodal.extractFeatures);
    * the stub's outputs are byte-derived, so DuckDB recomputes them from
    * the same (ASCII) text — the oracle checks the full plumbing: blob
    * packing, partitioning, batching, typed decode, feature shape. */
  private def q42(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.element_at
    val feats = Multimodal.extractFeatures(s,
      Multimodal.mediaFromDocuments(Tables.documents(s, dir)), batchSize = 64)
    feats.toDF()
      .select(col("id").as("doc_id"), col("byte_len"), col("width"), col("height"),
        // features are (byte & 0xff)/255f — recover the exact byte
        round(element_at(col("features"), 1) * 255, 0).cast("int").as("b0"),
        round(element_at(col("features"), 8) * 255, 0).cast("int").as("b7"))
  }
  // the CASE branches mirror the stub's len==0 guard (empty blob ->
  // all-zero features), so an empty-text row can't split the gate
  private val q42Sql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
      |  CAST(64 + octet_length(encode(text)) % 64 AS INT) AS width,
      |  CAST(64 + octet_length(encode(text)) % 48 AS INT) AS height,
      |  CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
      |            ELSE ord(substr(text, 1, 1)) END AS INT) AS b0,
      |  CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
      |            ELSE ord(substr(text, ((7 % octet_length(encode(text))) + 1), 1)) END AS INT) AS b7
      |FROM documents""".stripMargin

  // --------------------------------------------------------- q43
  /** IVF ANN with deterministic sample centroids (the k-means-refined
    * variant is spec-verified by recall — Similarity.ivfTopK): assign
    * every vector to its nearest of the 8 lowest-id embeddings, probe
    * the query's 2 nearest cells, brute-force cosine inside them.
    * Distances use the dot-product identity so both engines fold
    * identically. */
  private[queries] val IvfClusters = 8
  private val IvfProbe = 2
  private def q43(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    Similarity.ivfTopKFixed(emb, queries, AnnK, IvfClusters, IvfProbe)
  }
  private[queries] def distSql(a: String, b: String): String =
    s"list_dot_product($a, $a) - 2 * list_dot_product($a, $b) + list_dot_product($b, $b)"
  private val q43Sql =
    s"""WITH cents AS (SELECT vec_id AS cluster, embedding::DOUBLE[] AS c FROM embeddings WHERE vec_id < $IvfClusters),
       |base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, v, cluster FROM (
       |    SELECT b.vec_id, b.v, cents.cluster,
       |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |        ORDER BY ${distSql("b.v", "cents.c")} ASC, cents.cluster ASC) AS rn
       |    FROM base b, cents) WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM base WHERE vec_id < 10),
       |probes AS (
       |  SELECT q_id, qv, cluster FROM (
       |    SELECT q.q_id, q.qv, cents.cluster,
       |      ROW_NUMBER() OVER (PARTITION BY q.q_id
       |        ORDER BY ${distSql("q.qv", "cents.c")} ASC, cents.cluster ASC) AS rn
       |    FROM q, cents) WHERE rn <= $IvfProbe)
       |SELECT q_id, CAST(rn AS INT) AS rank, vec_id, round(cos, 6) AS cos_sim FROM (
       |  SELECT p.q_id, a.vec_id,
       |    list_dot_product(p.qv, a.v) / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))) AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY p.q_id
       |      ORDER BY list_dot_product(p.qv, a.v) / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))) DESC,
       |        a.vec_id ASC) AS rn
       |  FROM probes p JOIN assigned a USING (cluster) WHERE a.vec_id <> p.q_id)
       |WHERE rn <= $AnnK""".stripMargin

  // --------------------------------------------------------- q44
  /** Winnowing fingerprints (k-gram rolling hash + window minima —
    * Schleimer et al. SIGMOD'03) per document. */
  private[queries] val WinnowK = 8
  private[queries] val WinnowW = 4
  private def q44(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowFingerprint(Tables.documents(s, dir), "text", "doc_id",
      WinnowK, WinnowW)
  private val q44Sql = {
    val k = WinnowK; val w = WinnowW
    s"""WITH hs AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) >= $k
       |      THEN list_transform(range(1, length(text) - $k + 2),
       |             i -> ('0x' || substr(md5(substr(text, i, $k)), 1, 12))::BIGINT)
       |      ELSE [] END AS h
       |  FROM documents),
       |wins AS (
       |  SELECT doc_id,
       |    CASE WHEN len(h) = 0 THEN []
       |         WHEN len(h) <= $w THEN [list_min(h)]
       |         ELSE list_transform(range(0, len(h) - $w + 1),
       |                j -> list_min(list_transform(range(j + 1, j + $w + 1), x -> h[x])))
       |    END AS wmins
       |  FROM hs),
       |fps AS (SELECT doc_id, list_sort(list_distinct(wmins)) AS fps FROM wins)
       |SELECT doc_id, len(fps)::BIGINT AS fp_count,
       |  CASE WHEN len(fps) > 0
       |    THEN md5(array_to_string(list_transform(fps, y -> y::VARCHAR), ','))
       |    ELSE NULL END AS winnow_fp
       |FROM fps""".stripMargin
  }

  // --------------------------------------------------------- q45
  /** Frame sampling over media blobs: ≤4 uniformly-strided 32-byte
    * frames per blob, hashed (the decoder handoff). Oracle reproduces
    * the byte math on the ASCII text the blobs wrap (q42's
    * text-equivalence pattern — DuckDB's md5 is VARCHAR-only). */
  private val FrameBytes = 32
  private val MaxFrames = 4
  private def q45(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(
      Multimodal.mediaFromDocuments(Tables.documents(s, dir)),
      FrameBytes, MaxFrames)
  private val q45Sql =
    s"""WITH m AS (
       |  SELECT doc_id AS id, text, octet_length(encode(text)) AS len FROM documents),
       |f AS (
       |  SELECT id, text, (len + ${FrameBytes - 1}) // $FrameBytes AS nf FROM m),
       |st AS (
       |  SELECT id, text, nf, (nf + ${MaxFrames - 1}) // $MaxFrames AS stride FROM f
       |  WHERE nf > 0)
       |SELECT id, frame_idx,
       |  frame_idx * $FrameBytes AS frame_off,
       |  length(substr(text, CAST(frame_idx * $FrameBytes + 1 AS INT), $FrameBytes))::BIGINT AS frame_len,
       |  md5(substr(text, CAST(frame_idx * $FrameBytes + 1 AS INT), $FrameBytes)) AS frame_hash
       |FROM (SELECT id, text, unnest(range(0, nf, stride)) AS frame_idx FROM st)""".stripMargin

  // --------------------------------------------------------- q48
  /** n-gram Jaccard near-dup pairs: candidates from minhash banding
    * over word BIGRAM shingles, verified with exact Jaccard over the
    * distinct-bigram sets. Bigram sets see word-order edits that
    * unigram Jaccard (q28) is blind to. The exact-but-corpus-sensitive
    * alternative, [[graft.ops.Dedup.prefixFilterJaccardJoin]], is
    * spec-gated (DedupJoinSpec) — on this tiny-vocab synthetic corpus
    * prefix filtering degenerates while banding stays selective. */
  private val NgramN = 2
  private val NgramJaccardThreshold = 0.4
  /** Bigram signatures collide heavily on a small vocabulary (at sf0.1
    * the hottest bucket holds 311 docs → ~900 k candidate rows, 98% of
    * them storm noise), so this query exercises the production bucket
    * cap: buckets over [[NgramMaxBucket]] are dropped on BOTH sides of
    * the gate — the oracle mirrors the cap, proving it exactly. */
  private val NgramMaxBucket = 20
  private def q48(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bands = Dedup
      .bandKeys(docs, "text", "doc_id", Bands, RowsPerBand, NgramN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.ngramJaccardVerify(
      Dedup.candidatePairs(bands, maxBucket = NgramMaxBucket), docs,
      "text", "doc_id", NgramN, NgramJaccardThreshold)
  }
  private val q48Sql =
    s"""WITH ${bandsCteK(NgramN)},
       |keep AS (SELECT band, band_key FROM bands
       |         GROUP BY band, band_key HAVING count(*) <= $NgramMaxBucket),
       |fbands AS (SELECT b.* FROM bands b JOIN keep USING (band, band_key)),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM fbands a JOIN fbands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct(${shinglesSqlK(NgramN)}) AS toks FROM documents)
       |SELECT id_a, id_b,
       |  round(len(list_intersect(sa.toks, sb.toks))::DOUBLE /
       |        len(list_distinct(list_concat(sa.toks, sb.toks))), 4) AS jaccard
       |FROM pairs JOIN sets sa ON id_a = sa.doc_id JOIN sets sb ON id_b = sb.doc_id
       |WHERE len(list_intersect(sa.toks, sb.toks))::DOUBLE /
       |      len(list_distinct(list_concat(sa.toks, sb.toks))) >= $NgramJaccardThreshold""".stripMargin

  // --------------------------------------------------------- q49
  /** BM25 top-k retrieval for a fixed query-term bag: corpus stats are
    * one broadcast aggregate row; scoring is per-row codegen; the
    * top-k is TakeOrderedAndProject (no global sort). Both engines rank
    * by the ROUNDED score with doc_id tie-break, so the cut line cannot
    * diverge on sub-1e-6 noise. */
  private val Bm25Terms = Seq("join", "spark", "window")
  private val Bm25TopK = 20
  private def q49(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.bm25(Tables.documents(s, dir), "text", "doc_id",
        Bm25Terms)
      .select(col("doc_id"), col("dl"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(Bm25TopK)
  /** BM25 scoring CTE chain — ends in `bm(doc_id, dl, score)`; shared
    * by q49 (plain retrieval) and q131 (hybrid RRF fusion). */
  private val Bm25CoreSql = {
    def termScore(i: Int) =
      s"""ln(((n_docs - df$i) + 0.5) / (df$i + 0.5) + 1.0) *
         |  ((tf$i * (1.2 + 1.0)) /
         |   (tf$i + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl))))""".stripMargin
    val tfCols = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter($WsSplit, w -> w = '$t'))::BIGINT AS tf$i"
    }.mkString(", ")
    val dfCols = Bm25Terms.indices
      .map(i => s"count(*) FILTER (tf$i > 0) AS df$i").mkString(", ")
    val scoreExpr = Bm25Terms.indices.map(termScore).mkString(" + ")
    s"""tf AS (
       |  SELECT doc_id, len($WsSplit)::BIGINT AS dl, $tfCols FROM documents),
       |stats AS (
       |  SELECT count(*) AS n_docs, SUM(dl)::DOUBLE / count(*) AS avgdl, $dfCols
       |  FROM tf),
       |bm AS (
       |  SELECT doc_id, dl, round($scoreExpr, 6) AS score FROM tf, stats)""".stripMargin
  }
  private val q49Sql =
    s"""WITH $Bm25CoreSql
       |SELECT doc_id, dl, score FROM bm
       |ORDER BY score DESC, doc_id ASC LIMIT $Bm25TopK""".stripMargin

  // --------------------------------------------------------- q50
  /** Transitive near-dup clusters: verified LSH pairs → connected
    * components (min-label propagation; the oracle computes the same
    * closure with a recursive CTE). Complements q39's greedy keep —
    * cluster ids let a keep-policy pick one canonical doc per
    * TRANSITIVE group. */
  private def q50(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bands = Dedup
      .bandKeys(docs, "text", "doc_id", Bands, RowsPerBand, ShingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup
      .jaccardVerify(Dedup.candidatePairs(bands), docs, "text", "doc_id",
        JaccardThreshold)
      .select(col("id_a"), col("id_b"))
    Dedup.connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("cluster").as("cluster_id"))
  }
  private val q50Sql =
    s"""WITH RECURSIVE $BandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct($WsSplit) AS toks FROM documents),
       |vpairs AS (
       |  SELECT id_a, id_b
       |  FROM pairs JOIN sets sa ON id_a = sa.doc_id JOIN sets sb ON id_b = sb.doc_id
       |  WHERE len(list_intersect(sa.toks, sb.toks))::DOUBLE /
       |        len(list_distinct(list_concat(sa.toks, sb.toks))) >= $JaccardThreshold),
       |edges AS (SELECT id_a AS s, id_b AS d FROM vpairs
       |          UNION ALL SELECT id_b, id_a FROM vpairs),
       |reach AS (SELECT DISTINCT s AS node, s AS r FROM edges
       |          UNION
       |          SELECT e.s, r.r FROM edges e JOIN reach r ON r.node = e.d)
       |SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node""".stripMargin

  // --------------------------------------------------------- q52
  /** Winnow overlap search: doc pairs sharing ≥ 3 winnowing
    * fingerprints — substring-level partial-overlap detection (the
    * plagiarism-detector shape), distinct from whole-doc Jaccard
    * (q28/q48) and from equal-sketch clustering (q44). */
  private[queries] val WinnowMinShared = 3
  private[queries] val WinnowMaxDocsPerFp = 10
  private def q52(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowOverlapPairs(Tables.documents(s, dir), "text", "doc_id",
      WinnowK, WinnowW, WinnowMinShared, WinnowMaxDocsPerFp)
      .select(col("id_a"), col("id_b"), col("n_shared"))
  /** q52's oracle with the CORPUS membership and an outer pair
    * predicate parameterized — shared with the maintained-winnow
    * gates (CurationQueries q289/q290): `corpusWhere` restricts the
    * docs whose fingerprints exist (the RTBF survivors — the
    * boilerplate cap's dfs recompute over them, so a fingerprint
    * whose df drops back under the cap re-enters), `pairWhere`
    * restricts the reported pairs (e.g. to those touching the probed
    * batch). */
  private[queries] def q52SqlFor(corpusWhere: String,
      pairWhere: String): String = {
    val k = WinnowK; val w = WinnowW
    s"""WITH hs AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) >= $k
       |      THEN list_transform(range(1, length(text) - $k + 2),
       |             i -> ('0x' || substr(md5(substr(text, i, $k)), 1, 12))::BIGINT)
       |      ELSE [] END AS h
       |  FROM documents$corpusWhere),
       |wins AS (
       |  SELECT doc_id,
       |    CASE WHEN len(h) = 0 THEN []
       |         WHEN len(h) <= $w THEN [list_min(h)]
       |         ELSE list_transform(range(0, len(h) - $w + 1),
       |                j -> list_min(list_transform(range(j + 1, j + $w + 1), x -> h[x])))
       |    END AS wmins
       |  FROM hs),
       |fps AS (SELECT doc_id, unnest(list_distinct(wmins)) AS fp FROM wins),
       |keep AS (SELECT fp FROM fps GROUP BY fp
       |         HAVING count(*) <= $WinnowMaxDocsPerFp),
       |rare AS (SELECT f.* FROM fps f JOIN keep USING (fp)),
       |prs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
       |  FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= $WinnowMinShared)
       |SELECT id_a, id_b, n_shared FROM prs$pairWhere""".stripMargin
  }
  private val q52Sql = q52SqlFor("", "")

  // --------------------------------------------------------- q57
  /** Deterministic hash-based corpus split (train/val/test) — the
    * reproducible train-test partitioning every training-data pipeline
    * needs: a doc's split follows md5(text) alone, so ANY engine, any
    * partitioning, any run assigns identically (no RNG, no
    * sampleBy seed drift). Per-row codegen hash + one aggregation;
    * token totals ride along for corpus budgeting. 8/1/1 by hash
    * bucket. */
  private def q57(s: SparkSession, dir: String): DataFrame = {
    val bucket = conv(substring(md5(col("text")), 1, 6), 16, 10)
      .cast("long") % 10
    Tables.documents(s, dir)
      .select(
        when(bucket < 8, "train").when(bucket === 8, "val")
          .otherwise("test").as("split"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("toks"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
  }
  private val q57Sql =
    s"""SELECT CASE WHEN bucket < 8 THEN 'train'
       |            WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(toks) AS BIGINT) AS n_tokens
       |FROM (SELECT ('0x' || substr(md5(text), 1, 6))::BIGINT % 10 AS bucket,
       |             CAST(len($WsSplit) AS BIGINT) AS toks
       |      FROM documents)
       |GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q59
  /** Repetition quality metrics (the Gopher-rules family): per doc,
    * the repeated-token fraction and the share of all bigrams claimed
    * by the single most frequent bigram — the filters that catch
    * boilerplate/spam documents before they reach training. Token
    * fraction is pure per-row array math (zero shuffle); bigram
    * coverage is one keyed explode + two aggregations on doc_id.
    * Divisions are single IEEE ops on exact integers, so both engines
    * produce bit-identical doubles. */
  private def q59(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = docs.select(col("doc_id"), Dedup.words(col("text")).as("ws"))
    val tokenRep = toks.select(col("doc_id"),
      (lit(1.0) - size(array_distinct(col("ws"))).cast("double") /
        size(col("ws")).cast("double")).as("token_rep"))
    val bigrams = toks
      .select(col("doc_id"),
        explode(Dedup.shinglesOfWords(col("ws"), 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double"))
        .as("top_bigram_cov"))
    tokenRep.join(bigrams, Seq("doc_id"))
  }
  private val q59Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |tok AS (SELECT doc_id,
      |  1.0 - len(list_distinct(ws))::DOUBLE / len(ws)::DOUBLE AS token_rep
      |  FROM t),
      |bg AS (SELECT doc_id,
      |  unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
      |  FROM t WHERE len(ws) >= 2),
      |bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |bga AS (SELECT doc_id,
      |  MAX(c)::DOUBLE / CAST(SUM(c) AS BIGINT)::DOUBLE AS top_bigram_cov
      |  FROM bgc GROUP BY 1)
      |SELECT tok.doc_id, token_rep, top_bigram_cov
      |FROM tok JOIN bga USING (doc_id)""".stripMargin

  // --------------------------------------------------------- q61
  /** Benchmark decontamination: every 50th document plays the eval
    * suite; training docs sharing any distinct word trigram with it are
    * flagged with their overlap count (GPT-3's 13-gram rule, scaled to
    * this corpus' tiny vocabulary). The eval side is broadcast — the
    * training corpus is never shuffled. See
    * [[graft.ops.Dedup.decontaminate]] for the 100 TB shape. */
  private[queries] val DecontN = 3
  private def q61(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.decontaminate(
      train = docs.filter(col("doc_id") % 50 =!= 0),
      bench = docs.filter(col("doc_id") % 50 === 0),
      textCol = "text", idCol = "doc_id", n = DecontN)
  }
  /** q61's oracle with the BENCH membership parameterized — shared
    * with the maintained-screen gates (CurationQueries q279–q282),
    * whose eval-set index holds exactly the docs `benchPred` selects
    * (the train side is fixed at q61's `doc_id % 50 <> 0`). */
  private[queries] def q61SqlBench(benchPred: String): String =
    s"""WITH sh AS (SELECT doc_id,
       |  list_distinct(${shinglesSqlK(DecontN)}) AS grams FROM documents),
       |ex AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
       |bench AS (SELECT DISTINCT gram FROM ex WHERE $benchPred)
       |SELECT e.doc_id, count(*) AS shared_grams
       |FROM ex e JOIN bench USING (gram)
       |WHERE e.doc_id % 50 <> 0
       |GROUP BY e.doc_id""".stripMargin
  private[queries] val q61Sql = q61SqlBench("doc_id % 50 = 0")

  // --------------------------------------------------------- q62
  /** PII scrubbing: emails, phone-shaped spans, and ≥2-digit runs in
    * the event props payload are replaced with a redaction token —
    * three codegen'd global regexp_replace passes, per-row, zero
    * shuffle. The patterns are RE2-safe so the oracle replays them
    * verbatim. (The production default redacts ≥4-digit runs; this
    * corpus' synthetic ids are 1–2 digits, so the gate tightens the
    * run length to exercise the pass on real rows.) */
  private val PiiDigitRun = "[0-9]{2,}"
  private def q62(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("event_id"),
      graft.ops.TextAnalysis.redactPii(col("props"),
        patterns = Seq(graft.ops.TextAnalysis.EmailPattern, PiiDigitRun),
        token = "#").as("clean_props"))
  private val q62Sql =
    s"""SELECT event_id,
       |  regexp_replace(
       |    regexp_replace(props,
       |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '#', 'g'),
       |    '$PiiDigitRun', '#', 'g') AS clean_props
       |FROM events""".stripMargin

  // --------------------------------------------------------- q66
  /** Token-budget mixing: cap every source at ~[[MixTargetTokens]]
    * training tokens by computing a per-source keep rate from the
    * actual token totals, then sampling deterministically (salted md5,
    * reproducible across engines and retries). Shape: one
    * partial-aggregated groupBy produces the rate table — bounded by
    * the number of SOURCES, so it broadcasts — and the corpus itself
    * sees one map-side join + filter: no shuffle of the 100 TB side.
    * The rate division is a single IEEE op on exact integers, so the
    * keep/drop cut line is bit-identical in the oracle. */
  private val MixTargetTokens = 600.0
  private def q66(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(Dedup.words(col("text"))).cast("long").as("n_toks"))
    val rates = toks.groupBy(col("source"))
      .agg(sum(col("n_toks")).as("src_toks"))
      .select(col("source"),
        least(lit(1.0), lit(MixTargetTokens) / col("src_toks").cast("double"))
          .as("rate"))
    val bucket = conv(
      substring(md5(concat(col("doc_id").cast("string"), lit(":budget"))),
        1, 15), 16, 10).cast("long") % 10000
    toks.join(broadcast(rates), "source")
      .filter(bucket.cast("double") / lit(10000.0) < col("rate"))
      .select(col("doc_id"), col("source"), col("n_toks"))
  }
  private val q66Sql =
    s"""WITH toks AS (SELECT doc_id, source,
       |    CAST(len($WsSplit) AS BIGINT) AS n_toks FROM documents),
       |tot AS (SELECT source, CAST(SUM(n_toks) AS BIGINT) AS src_toks
       |        FROM toks GROUP BY 1),
       |rates AS (SELECT source,
       |    least(1.0::DOUBLE, $MixTargetTokens / src_toks::DOUBLE) AS rate
       |    FROM tot)
       |SELECT t.doc_id, t.source, t.n_toks
       |FROM toks t JOIN rates r USING (source)
       |WHERE (('0x' || substr(md5(t.doc_id::VARCHAR || ':budget'), 1, 15))::BIGINT
       |       % 10000) / 10000.0 < r.rate""".stripMargin

  // --------------------------------------------------------- q67
  /** The composed cleaning pass — what an actual pre-training run
    * executes, as ONE plan: exact-dedup canonical docs only, quality
    * score over threshold, eval set held out, and benchmark-contaminated
    * docs quarantined ([[q61]]'s trigram rule). Composition stays
    * scale-shaped because each stage is: a window over the content hash
    * (one keyed shuffle), per-row codegen scoring (zero shuffle), a
    * broadcast semi/anti join against the bounded eval side. Catalyst
    * fuses the per-row stages into the same whole-stage codegen span. */
  private[queries] val CleanQualityMin = 0.5
  private def q67(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val canonical = Dedup.exactDedup(docs, "text", "doc_id")
      .filter(col("is_canonical")).select(col("doc_id"))
    val contaminated = Dedup.decontaminate(
      train = docs.filter(col("doc_id") % 50 =!= 0),
      bench = docs.filter(col("doc_id") % 50 === 0),
      textCol = "text", idCol = "doc_id", n = DecontN)
      .select(col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScore(col("text"), col("n_chars")).as("quality"))
      .filter(col("doc_id") % 50 =!= 0)
      .filter(col("quality") >= CleanQualityMin)
      .join(canonical, Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
  }
  /** q67's CTE chain (canonical flag, quality score, contamination
    * hits) without the final SELECT — shared with the maintained-state
    * funnel gates (CurationQueries q295/q296), whose oracles append
    * the semantic-prune chain to the same funnel. The BENCH membership
    * is parameterized for the retention arm (q296 screens against the
    * suites SURVIVING a withdrawal); the train side stays the fixed
    * `% 50 <> 0` holdout. */
  private[queries] def cleanCtes(benchPred: String): String =
    s"""canon AS (SELECT doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1 AS canonical
       |  FROM documents),
       |qual AS (
       |  SELECT doc_id, round((len_band + word_band + (1.0 - least(punct * 4, 1.0))) / 3.0, 4) AS quality
       |  FROM (
       |    SELECT doc_id, n_chars,
       |      len(list_filter(list_transform($WsSplit, w -> substr(w, 1, 1)),
       |          c -> NOT regexp_matches(c, '[A-Za-z0-9]')))::DOUBLE
       |        / greatest(len($WsSplit), 1) AS punct,
       |      CASE WHEN n_chars BETWEEN 100 AND 400 THEN 1.0
       |           WHEN n_chars BETWEEN 50 AND 99 OR n_chars BETWEEN 401 AND 600 THEN 0.5
       |           ELSE 0.0 END AS len_band,
       |      CASE WHEN n_chars::DOUBLE / greatest(len($WsSplit), 1) BETWEEN 3.0 AND 8.0
       |           THEN 1.0 ELSE 0.5 END AS word_band
       |    FROM documents)),
       |shg AS (SELECT doc_id, list_distinct(${shinglesSqlK(DecontN)}) AS grams FROM documents),
       |ex AS (SELECT doc_id, unnest(grams) AS gram FROM shg),
       |bench AS (SELECT DISTINCT gram FROM ex WHERE $benchPred),
       |hits AS (SELECT DISTINCT e.doc_id FROM ex e JOIN bench USING (gram)
       |         WHERE e.doc_id % 50 <> 0)""".stripMargin
  private[queries] val CleanCtes = cleanCtes("doc_id % 50 = 0")
  private val q67Sql =
    s"""WITH $CleanCtes
       |SELECT d.doc_id, d.lang, q.quality
       |FROM documents d JOIN canon USING (doc_id) JOIN qual q USING (doc_id)
       |WHERE canonical AND d.doc_id % 50 <> 0 AND q.quality >= $CleanQualityMin
       |  AND d.doc_id NOT IN (SELECT doc_id FROM hits)""".stripMargin

  // --------------------------------------------------------- q68
  /** Recursive CTE (WITH RECURSIVE, new SQL surface in Spark 4): walk
    * near-dup canonical chains — every doc keeps ONE outgoing edge, its
    * smallest-id verified near-dup, so the graph is a forest and the
    * recursion is LINEAR (rows = Σ chain depths; depth ≤ 16 at sf0.1).
    * That shaping is the point: recursing over the raw pair graph
    * multiplies clique paths combinatorially (7.3M intermediate rows
    * from 11k pairs at sf0.1 — measured), so unrestricted transitive
    * closure belongs to [[graft.ops.Dedup.connectedComponents]] (q50);
    * the recursive operator is for genuinely hierarchical walks.
    * Spark's recursion only supports UNION ALL, hence the ascending-id
    * forest guaranteeing termination (both engines run the identical
    * recursion). */
  private def q68(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bands = Dedup
      .bandKeys(docs, "text", "doc_id", Bands, RowsPerBand, ShingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the successor table BEFORE walking: a lazy plan would
    // re-run the whole LSH+verify chain per round (16 rounds × full
    // pipeline = 12s at sf0.1, measured). The PageRank discipline
    // (guide §2.4): the loop-invariant side is hash-partitioned by the
    // join key ONCE and eagerly checkpointed — LogicalRDD keeps the
    // partitioning, so every round's join leaves succ where it sits and
    // only the (shrinking) frontier moves.
    val succ = Dedup.jaccardVerify(Dedup.candidatePairs(bands), docs,
        "text", "doc_id", JaccardThreshold)
      .groupBy(col("id_a")).agg(min(col("id_b")).as("id_b"))
      .repartition(col("id_a"))
      .localCheckpoint(true)
    // Recursive DOUBLING in place of WITH RECURSIVE: the SQL UnionLoop
    // paid ~5 driver jobs per unit-depth round (103 jobs for depth ≤ 16
    // at sf0.1 — the per-round latency, not data volume, was the whole
    // cost; the same chain without the walk is 8 jobs). Pointer jumping
    // makes the round count LOGARITHMIC in the deepest chain: round k
    // extends every known path (depth < 2^k) by one exact 2^k-jump —
    // the jump table J_k(node → 2^k-th successor) is the loop's
    // squared successor relation, at most one row per node. Identical
    // output rows: every depth d decomposes uniquely in binary, so each
    // (root, node, depth) triple is produced exactly once; the
    // ascending-id forest still guarantees termination. At 100 TB the
    // same change turns a 1000-round straggler chain into 10 rounds.
    val anchor = succ.select(col("id_a"))
      .join(succ.select(col("id_b").as("__is_succ")),
        col("id_a") === col("__is_succ"), "left_anti")
      .select(col("id_a").as("root"), col("id_a").as("node"),
        lit(0).as("depth"))
      .localCheckpoint(true)
    // pieces(k) holds depths [2^(k-1), 2^k); their lazy union feeds the
    // next extension without recopying materialized rows
    val pieces = scala.collection.mutable.ArrayBuffer[DataFrame](anchor)
    var jump = succ.select(col("id_a").as("jf"), col("id_b").as("jt"),
      lit(1).as("jd"))
    var growing = true
    while (growing) {
      val known = pieces.reduce(_ unionByName _)
      val step = known
        .join(jump, known("node") === jump("jf"))
        .select(known("root"), col("jt").as("node"),
          (known("depth") + col("jd")).as("depth"))
        .localCheckpoint(true)
      if (step.isEmpty) growing = false
      else {
        pieces += step
        val j2 = jump.select(col("jf"), col("jt").as("__mid"), col("jd"))
        val j3 = jump.select(col("jf").as("__mid2"), col("jt"),
          col("jd").as("__jd2"))
        jump = j2.join(j3, col("__mid") === col("__mid2"))
          .select(col("jf"), col("jt"), (col("jd") + col("__jd2")).as("jd"))
          .localCheckpoint(true)
      }
    }
    pieces.reduce(_ unionByName _)
  }
  private val q68Sql =
    s"""WITH RECURSIVE $BandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct($WsSplit) AS toks FROM documents),
       |verified AS (
       |  SELECT id_a, id_b FROM pairs
       |  JOIN sets sa ON id_a = sa.doc_id JOIN sets sb ON id_b = sb.doc_id
       |  WHERE len(list_intersect(sa.toks, sb.toks))::DOUBLE /
       |        len(list_distinct(list_concat(sa.toks, sb.toks))) >= $JaccardThreshold),
       |succ AS (SELECT id_a, MIN(id_b) AS id_b FROM verified GROUP BY id_a),
       |walk(root, node, depth) AS (
       |  SELECT id_a, id_a, 0 FROM succ
       |  WHERE id_a NOT IN (SELECT id_b FROM succ)
       |  UNION ALL
       |  SELECT w.root, s.id_b, w.depth + 1
       |  FROM walk w JOIN succ s ON w.node = s.id_a)
       |SELECT root, node, depth FROM walk""".stripMargin

  // --------------------------------------------------------- q69
  /** Edit-distance near-dup pairs: LSH candidates verified by
    * thresholded Levenshtein ([[graft.ops.Dedup.editDistanceVerify]]) —
    * character-level edits that token Jaccard under-weights. Spark runs
    * the banded O(len·maxDist) early-exit form; the oracle's full
    * quadratic levenshtein agrees exactly on every kept pair because
    * the threshold filter is applied on both sides. */
  private val EditDistMax = 20
  private def q69(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bands = Dedup
      .bandKeys(docs, "text", "doc_id", Bands, RowsPerBand, ShingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.editDistanceVerify(Dedup.candidatePairs(bands), docs,
      "text", "doc_id", EditDistMax)
  }
  private val q69Sql =
    s"""WITH $BandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
       |SELECT p.id_a, p.id_b, levenshtein(da.text, db.text) AS edit_dist
       |FROM pairs p
       |JOIN documents da ON p.id_a = da.doc_id
       |JOIN documents db ON p.id_b = db.doc_id
       |WHERE levenshtein(da.text, db.text) <= $EditDistMax""".stripMargin

  // --------------------------------------------------------- q72
  /** Unigram LM surprisal (the CCNet-discipline language-model filter,
    * self-trained): score every document by its mean negative log
    * probability under the corpus' own unigram distribution — gibberish
    * and boilerplate land in the tails. Scale shape: the frequency
    * table is one partial-aggregated groupBy keyed by word (NOT
    * broadcast — real vocabularies run to hundreds of millions), the
    * lookup is a keyed equi-join, and the corpus total is a 1-row
    * broadcast. Double determinism: per-doc log-probs are summed by
    * POSITION-ORDERED left fold on both engines (`aggregate` HOF here,
    * `list_reduce` there) — a plain SUM would fold in shuffle order and
    * flip low bits. */
  /** The position-exploded word stream `(doc_id, pos, word)` — q72's
    * input projection, shared with the incremental scorer
    * (CurationQueries q287/q288), whose maintained LM store aggregates
    * exactly these rows. */
  private[queries] def surprisalWords(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Dedup.words(col("text")).as("ws"))
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "word")))

  /** The q72 scoring tail — per-position log-prob, position-ordered
    * fold, per-doc mean — over caller-supplied counts: `freq` is
    * (word, c), `tot` is a 1-row (n). The batch path (q72) and the
    * maintained-store path (q287/q288) share the column tree by
    * construction, so both land on bit-identical doubles. */
  private[queries] def surprisalScore(w: DataFrame, freq: DataFrame,
      tot: DataFrame): DataFrame = {
    val lp = w.join(freq, "word").crossJoin(broadcast(tot))
      .select(col("doc_id"), col("pos"),
        log(col("c").cast("double") / col("n").cast("double")).as("lpw"))
    lp.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("lpw")))).as("arr"),
        count(lit(1)).as("n_toks"))
      .select(col("doc_id"), col("n_toks"),
        // round(· , 6): Java's Math.log and DuckDB's libm ln may differ
        // by 1 ULP on some inputs (first observed at sf0.1 — 15 of 5000
        // rows), and an unrounded double output turns that into a hash
        // mismatch; 6-decimal rounding absorbs it like every other
        // transcendental output in the registry
        round(-aggregate(col("arr"), lit(0.0),
          (acc, x) => acc + x.getField("lpw")) / col("n_toks").cast("double"), 6)
          .as("surprisal"))
  }

  private def q72(s: SparkSession, dir: String): DataFrame = {
    val w = surprisalWords(Tables.documents(s, dir))
    // persist the vocabulary: it feeds both the lookup join and the
    // corpus total, and Catalyst would otherwise re-scan the corpus to
    // rebuild it for each consumer (three full passes instead of two)
    val freq = w.groupBy(col("word")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = freq.agg(sum(col("c")).as("n"))
    surprisalScore(w, freq, tot)
  }
  /** q72's oracle with the LM corpus and the scored set parameterized
    * — shared with the incremental-surprisal gates (CurationQueries
    * q287/q288): `corpusWhere` restricts the docs the LM counts (the
    * RTBF survivors), `scoredWhere` restricts the final per-doc
    * scores to the arriving batch (the LM stays corpus-wide — exactly
    * what the maintained store holds). */
  private[queries] def q72SqlScored(corpusWhere: String,
      scoredWhere: String): String =
    s"""WITH t AS (SELECT doc_id, $WsSplit AS ws FROM documents$corpusWhere),
       |w AS (SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS pos FROM t),
       |freq AS (SELECT word, COUNT(*) AS c FROM w GROUP BY 1),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM freq),
       |lp AS (SELECT doc_id, pos, ln(c::DOUBLE / n::DOUBLE) AS lpw
       |       FROM w JOIN freq USING (word) CROSS JOIN tot),
       |agg AS (SELECT doc_id,
       |    list_reduce(list(lpw ORDER BY pos), (a, b) -> a + b) AS s,
       |    COUNT(*) AS n_toks
       |  FROM lp$scoredWhere GROUP BY doc_id)
       |SELECT doc_id, n_toks, round(-s / n_toks::DOUBLE, 6) AS surprisal FROM agg""".stripMargin
  private val q72Sql = q72SqlScored("", "")

  // --------------------------------------------------------- q73
  /** Token chunking: 16-token windows, 4-token overlap (stride 12) —
    * [[graft.ops.TextAnalysis.chunk]]. Pure per-row explode+slice. */
  private val ChunkTokens = 16
  private val ChunkOverlap = 4
  private def q73(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunk(Tables.documents(s, dir), "text", "doc_id",
      ChunkTokens, ChunkOverlap)
  private val q73Sql = {
    val stride = ChunkTokens - ChunkOverlap
    s"""WITH t AS (SELECT doc_id, $WsSplit AS ws FROM documents),
       |c AS (SELECT doc_id, ws,
       |  unnest(range(0, greatest(len(ws) - $ChunkOverlap, 1), $stride)) AS start
       |  FROM t)
       |SELECT doc_id, CAST(start // $stride AS BIGINT) AS chunk_id,
       |  CAST(start AS BIGINT) AS start_tok,
       |  array_to_string(ws[start + 1 : start + $ChunkTokens], ' ') AS chunk_text,
       |  CAST(least($ChunkTokens, len(ws) - start) AS BIGINT) AS n_toks
       |FROM c""".stripMargin
  }

  // --------------------------------------------------------- q75
  /** Per-source curation report — the dashboard a data-quality owner
    * watches: doc counts, exact-dup counts, and total quality mass per
    * source, in ONE partial-aggregated pass. The quality mean rides an
    * integer trick: each rounded score becomes an exact
    * `ROUND(q*10000)` BIGINT, so the SUM is order-independent and
    * hash-identical (a double SUM would fold in shuffle order);
    * consumers divide by `n_docs` at display time. */
  private def q75(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), md5(col("text")).as("ck"),
        TextAnalysis.qualityScore(col("text"), col("n_chars")).as("quality"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        (count(lit(1)) - countDistinct(col("ck"))).as("n_dups"),
        sum(round(col("quality") * 10000).cast("long")).as("quality_dmil"))
  private val q75Sql =
    s"""WITH q AS (
       |  SELECT doc_id, source, md5(text) AS ck,
       |    round((len_band + word_band + (1.0 - least(punct * 4, 1.0))) / 3.0, 4) AS quality
       |  FROM (
       |    SELECT doc_id, source, text, n_chars,
       |      len(list_filter(list_transform($WsSplit, w -> substr(w, 1, 1)),
       |          c -> NOT regexp_matches(c, '[A-Za-z0-9]')))::DOUBLE
       |        / greatest(len($WsSplit), 1) AS punct,
       |      CASE WHEN n_chars BETWEEN 100 AND 400 THEN 1.0
       |           WHEN n_chars BETWEEN 50 AND 99 OR n_chars BETWEEN 401 AND 600 THEN 0.5
       |           ELSE 0.0 END AS len_band,
       |      CASE WHEN n_chars::DOUBLE / greatest(len($WsSplit), 1) BETWEEN 3.0 AND 8.0
       |           THEN 1.0 ELSE 0.5 END AS word_band
       |    FROM documents))
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(COUNT(*) - COUNT(DISTINCT ck) AS BIGINT) AS n_dups,
       |  CAST(SUM(CAST(ROUND(quality * 10000) AS BIGINT)) AS BIGINT) AS quality_dmil
       |FROM q GROUP BY source""".stripMargin

  // --------------------------------------------------------- q79
  /** Export shard planning: deterministic shard assignment (salted md5,
    * reproducible anywhere) with per-shard doc and token totals — the
    * manifest a sharded training-data export (WebDataset-style) is cut
    * from. One partial-aggregated groupBy; token counts are exact
    * integers. */
  private val ExportShards = 8
  private def q79(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        (conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":shard"))), 1, 15), 16, 10).cast("long") % ExportShards)
          .as("shard_id"),
        size(Dedup.words(col("text"))).cast("long").as("toks"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
  private val q79Sql =
    s"""SELECT ('0x' || substr(md5(doc_id::VARCHAR || ':shard'), 1, 15))::BIGINT
       |    % $ExportShards AS shard_id,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(CAST(len($WsSplit) AS BIGINT)) AS BIGINT) AS n_tokens
       |FROM documents GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q80
  /** Embedding-run backlog: which documents still lack a vector after a
    * partial embedding pass (simulated here as vec_id < 400), counted
    * per language — the work-scheduling query an embedding pipeline
    * runs between batches. Anti-join keyed on the id; the vector BYTES
    * are never read, only the id column (column pruning does the rest).
    */
  private val EmbeddedUpTo = 400
  private def q80(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .join(Tables.embeddings(s, dir)
          .filter(col("vec_id") < EmbeddedUpTo)
          .select(col("vec_id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_missing"), min(col("doc_id")).as("next_doc"))
  private val q80Sql =
    s"""SELECT lang, COUNT(*) AS n_missing, MIN(doc_id) AS next_doc
       |FROM documents d
       |WHERE NOT EXISTS (SELECT 1 FROM embeddings e
       |                  WHERE e.vec_id < $EmbeddedUpTo AND e.vec_id = d.doc_id)
       |GROUP BY lang""".stripMargin

  // --------------------------------------------------------- q81
  /** Hard-negative mining: each query vector's top-k most-similar
    * corpus vectors with a DIFFERENT label — the batch that contrastive
    * / embedding training loops feed beside each positive pair.
    * Pre-filter ANN ([[Similarity.topKNeighborsWhere]]): the label
    * predicate prunes candidates BEFORE any similarity math, so k
    * results always come back (post-filtering a top-k can come back
    * short) and the filter cuts the dot-product work proportionally. */
  private def q81(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"))
    Similarity.topKNeighborsWhere(emb, queries, AnnK,
      col("label") =!= col("q_label"))
  }
  private val q81Sql =
    s"""WITH q AS (SELECT vec_id AS q_id, label AS q_label,
       |            embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT q_id, CAST(rn AS INT) AS rank, vec_id, round(cos, 6) AS cos_sim FROM (
       |  SELECT q_id, vec_id, $CosSql AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY $CosSql DESC, vec_id) AS rn
       |  FROM q, c WHERE vec_id <> q_id AND label <> q_label)
       |WHERE rn <= $AnnK""".stripMargin

  // --------------------------------------------------------- q82
  /** Top-3 TF-IDF terms per document ([[TextAnalysis.tfidfTopTerms]]):
    * keyword extraction over the corpus. The df table reuses the tf
    * aggregate (no second corpus scan) and N is a 1-row broadcast;
    * score = tf·ln(N/df) is exact-integer × one libm ln, ties break on
    * term text — fully reproducible in the oracle. */
  private val TfidfTopN = 3
  private def q82(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), "text", "doc_id",
      TfidfTopN)
  private val q82Sql =
    s"""WITH w AS (SELECT doc_id, unnest($WsSplit) AS term FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |s AS (SELECT doc_id, term, tf,
       |    tf::DOUBLE * ln(n_docs::DOUBLE / df::DOUBLE) AS score,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY tf::DOUBLE * ln(n_docs::DOUBLE / df::DOUBLE) DESC, term) AS rn
       |  FROM tf JOIN df USING (term) CROSS JOIN n)
       |SELECT doc_id, term, tf, CAST(rn AS INT) AS rank,
       |  round(score, 6) AS score
       |FROM s WHERE rn <= $TfidfTopN""".stripMargin

  // --------------------------------------------------------- q85
  /** Product-quantization encode ([[Similarity.pqEncode]]): each
    * 64-dim vector → 4 codes (nearest codeword per 16-dim subspace,
    * codebook = the 16 lowest-id vectors). The compression layer of
    * IVF-PQ — the layout a 100 TB vector index ships. Zero shuffles:
    * the codebook is a bounded literal, assignment is one per-row
    * codegen kernel per subspace. */
  private val PqM = 4
  private val PqK = 16
  private def q85(s: SparkSession, dir: String): DataFrame =
    Similarity.pqEncode(Tables.embeddings(s, dir), PqM, PqK)
  private val q85Sql = {
    val dsub = 64 / PqM
    // codes are POSITIONAL (rank of vec_id among the k lowest, 0-based)
    // to mirror pqCodebook exactly — NOT raw vec_id values, which only
    // coincide when ids happen to be contiguous from 0 (ADVICE r5)
    s"""WITH cbv AS (SELECT vec_id, embedding::DOUBLE[] AS cv
       |             FROM embeddings ORDER BY vec_id LIMIT $PqK),
       |cb AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, cv
       |       FROM cbv),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings),
       |ms AS (SELECT unnest(range(0, $PqM)) AS m),
       |sv AS (SELECT vec_id, m, vv[m*$dsub+1 : (m+1)*$dsub] AS s FROM v CROSS JOIN ms),
       |sc AS (SELECT code, m, cv[m*$dsub+1 : (m+1)*$dsub] AS c FROM cb CROSS JOIN ms),
       |d AS (SELECT vec_id, sv.m AS m, code,
       |        list_dot_product(s, s) - 2 * list_dot_product(s, c)
       |          + list_dot_product(c, c) AS dist
       |      FROM sv JOIN sc ON sv.m = sc.m),
       |r AS (SELECT vec_id, m, code,
       |        ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rn
       |      FROM d)
       |SELECT vec_id, CAST(m AS INT) AS subspace, CAST(code AS INT) AS code
       |FROM r WHERE rn = 1""".stripMargin
  }

  // --------------------------------------------------------- q89
  /** Cluster survivorship merge: the decision record a dedup pass
    * hands downstream — per transitive near-dup cluster (q50's
    * connected components), the canonical id (cluster min), member
    * count, the longest member's length (keep-longest policy input)
    * and provenance breadth. One keyed join of the cluster map against
    * the corpus plus one aggregation; cluster count, not corpus size,
    * bounds the output. */
  private def q89(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bands = Dedup
      .bandKeys(docs, "text", "doc_id", Bands, RowsPerBand, ShingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup
      .jaccardVerify(Dedup.candidatePairs(bands), docs, "text", "doc_id",
        JaccardThreshold)
      .select(col("id_a"), col("id_b"))
    Dedup.connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("cluster").as("cluster_id"))
      .join(docs.select(col("doc_id"), col("n_chars"), col("source")), "doc_id")
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_chars")).as("max_chars"),
        countDistinct(col("source")).as("n_sources"))
  }
  private val q89Sql =
    s"""WITH RECURSIVE $BandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct($WsSplit) AS toks FROM documents),
       |vpairs AS (
       |  SELECT id_a, id_b
       |  FROM pairs JOIN sets sa ON id_a = sa.doc_id JOIN sets sb ON id_b = sb.doc_id
       |  WHERE len(list_intersect(sa.toks, sb.toks))::DOUBLE /
       |        len(list_distinct(list_concat(sa.toks, sb.toks))) >= $JaccardThreshold),
       |edges AS (SELECT id_a AS s, id_b AS d FROM vpairs
       |          UNION ALL SELECT id_b, id_a FROM vpairs),
       |reach AS (SELECT DISTINCT s AS node, s AS r FROM edges
       |          UNION
       |          SELECT e.s, r.r FROM edges e JOIN reach r ON r.node = e.d),
       |cl AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node)
       |SELECT cluster_id, COUNT(*) AS n_docs, MAX(n_chars) AS max_chars,
       |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
       |FROM cl JOIN documents USING (doc_id)
       |GROUP BY cluster_id""".stripMargin

  // --------------------------------------------------------- q93
  /** Robust per-source outlier filter: median absolute deviation (MAD)
    * over document lengths — the curation-pipeline outlier rule that,
    * unlike mean±k·σ, a handful of giant documents can't drag. Exact
    * grouped medians (`percentile` — bit-matches DuckDB `quantile_cont`
    * per q51), two keyed aggregations + two keyed joins; at 100 TB
    * unbounded-cardinality profiling swaps in the approx_percentile
    * sketch (ops/Sketches) with identical plumbing. */
  private val MadK = 3.0
  private def q93(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("source"), col("n_chars"))
    val med = docs.groupBy(col("source"))
      .agg(expr("percentile(n_chars, 0.5)").as("med"))
    val dev = docs.join(med, "source")
      .select(col("source"), col("n_chars"), col("med"),
        abs(col("n_chars") - col("med")).as("dev"))
    val mad = dev.groupBy(col("source"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(mad, "source")
      .groupBy(col("source"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("dev") > lit(MadK) * col("mad"), 1)).as("n_outliers"))
      .select(col("source"), col("n_docs"), col("n_outliers"),
        col("med").as("median_chars"), col("mad"))
  }
  private val q93Sql =
    s"""WITH med AS (SELECT source, quantile_cont(n_chars, 0.5) AS med
       |            FROM documents GROUP BY 1),
       |dev AS (SELECT d.source, m.med, abs(d.n_chars - m.med) AS dev
       |        FROM documents d JOIN med m USING (source)),
       |mad AS (SELECT source, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1)
       |SELECT dev.source, COUNT(*) AS n_docs,
       |  COUNT(*) FILTER (WHERE dev > $MadK * x.mad) AS n_outliers,
       |  dev.med AS median_chars, x.mad AS mad
       |FROM dev JOIN mad x USING (source)
       |GROUP BY dev.source, dev.med, x.mad""".stripMargin

  // --------------------------------------------------------- q96
  /** Bigram PMI collocations ([[TextAnalysis.bigramPmi]]): the
    * phrase-mining pass behind tokenizer/vocab curation. Exact BIGINT
    * counts, one division tree + one libm ln (the q49/q72/q82
    * determinism discipline), ordering on the rounded score. */
  private val PmiMinCount = 5L
  private val PmiTopN = 20
  private def q96(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramPmi(Tables.documents(s, dir), "text",
      PmiMinCount, PmiTopN)
  private val q96Sql =
    s"""WITH w AS (SELECT $WsSplit AS ws FROM documents),
       |bg AS (SELECT ws[i] AS w1, ws[i+1] AS w2
       |       FROM w, UNNEST(range(1, len(ws))) AS t(i)),
       |uni AS (SELECT ws[i] AS wd, COUNT(*) AS cu
       |        FROM w, UNNEST(range(1, len(ws)+1)) AS t(i) GROUP BY 1),
       |bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
       |       HAVING COUNT(*) >= $PmiMinCount),
       |tot AS (SELECT (SELECT COUNT(*) FROM bg) AS nb,
       |               (SELECT SUM(cu) FROM uni) AS nw),
       |s AS (SELECT w1, w2, c12,
       |   round(ln((c12::DOUBLE / nb::DOUBLE) /
       |     ((u1.cu::DOUBLE / nw::DOUBLE) * (u2.cu::DOUBLE / nw::DOUBLE))), 6) AS pmi
       |   FROM bc JOIN uni u1 ON bc.w1 = u1.wd JOIN uni u2 ON bc.w2 = u2.wd
       |   CROSS JOIN tot)
       |SELECT w1, w2, c12, pmi FROM s
       |ORDER BY pmi DESC, w1, w2 LIMIT $PmiTopN""".stripMargin

  // --------------------------------------------------------- q97
  /** Triangles of the verified near-dup graph ([[Graphs.triangles]]):
    * how cliquish the q28 pair set is — the transitivity audit that
    * tells a dedup pipeline whether its candidate families are tight
    * clusters or loose chains. Ordered orientation (a < b < c) emits
    * each triangle once via two keyed equi-joins; the oracle replays
    * the same wedge-close joins over the same verified edge set. */
  private def q97(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bands = Dedup
      .bandKeys(docs, "text", "doc_id", Bands, RowsPerBand, ShingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup
      .jaccardVerify(Dedup.candidatePairs(bands), docs, "text", "doc_id",
        JaccardThreshold)
      .select(col("id_a"), col("id_b"))
    Graphs.triangles(pairs)
  }
  private val q97Sql =
    s"""WITH $BandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct($WsSplit) AS toks FROM documents),
       |e AS (SELECT id_a AS u, id_b AS v
       |  FROM pairs JOIN sets sa ON id_a = sa.doc_id JOIN sets sb ON id_b = sb.doc_id
       |  WHERE len(list_intersect(sa.toks, sb.toks))::DOUBLE /
       |        len(list_distinct(list_concat(sa.toks, sb.toks))) >= $JaccardThreshold)
       |SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |FROM e e1 JOIN e e2 ON e1.v = e2.u
       |JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v""".stripMargin

  // --------------------------------------------------------- q98
  /** Per-source doc-length histogram ([[TextAnalysis.lengthHistogram]]):
    * the curation length-distribution report. Integer `div` bucketing —
    * no floating floor at bucket edges. */
  private val HistBucket = 200L
  private def q98(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lengthHistogram(Tables.documents(s, dir),
      "n_chars", "source", HistBucket)
  private val q98Sql =
    s"""SELECT source,
       |  CAST(n_chars // $HistBucket * $HistBucket AS BIGINT) AS bucket,
       |  COUNT(*) AS n,
       |  CAST(MIN(n_chars) AS BIGINT) AS lo, CAST(MAX(n_chars) AS BIGINT) AS hi
       |FROM documents GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------- q103
  /** Canonical text normalization ([[TextAnalysis.normalizeText]]):
    * lower → Unicode NFC (native `nfc_normalize` codegen kernel) →
    * accent strip → whitespace collapse → trim, per-row and
    * shuffle-free. The synthetic corpus is ASCII, so the query injects
    * a fixed suffix with accents and doubled spaces — DELIBERATELY
    * composed (é) on the Spark side and decomposed (e + chr 769) in
    * the oracle: the gate passes only if both engines' NFC converges
    * the two encodings to identical bytes through the whole chain,
    * proving the normalization itself, not just the ASCII fast path. */
  private def q103(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      TextAnalysis.normalizeText(
        concat(col("text"), lit(" Café  ÈCOLE  Ångström")))
        .as("norm"))
  private val q103Sql =
    s"""SELECT doc_id, trim(regexp_replace(translate(nfc_normalize(lower(
       |  text || ' Cafe' || chr(769) || '  ÈCOLE  Ångström')),
       |  '${TextAnalysis.AccentFrom}', '${TextAnalysis.AccentTo}'),
       |  '\\s+', ' ', 'g')) AS norm
       |FROM documents""".stripMargin

  // --------------------------------------------------------- q104
  /** Per-label mean embedding ([[Similarity.labelCentroids]]) — the
    * k-means/IVF E-step as a gated op. Exact scaled-integer sums make
    * the result bit-identical regardless of partial-aggregation order;
    * the oracle replays the identical integer arithmetic so the gate
    * proves the reproducible-training-stats discipline itself. */
  private def q104(s: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroids(
      Tables.embeddings(s, dir), "embedding", "label")
  private val q104Sql =
    """SELECT label, CAST(pos - 1 AS INT) AS pos,
      |  CAST(SUM(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_scaled,
      |  CAST(COUNT(*) AS BIGINT) AS cnt,
      |  round(CAST(SUM(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT)
      |        / COUNT(*) / 1000000.0, 6) AS centroid
      |FROM (SELECT label, unnest(embedding) AS v,
      |             generate_subscripts(embedding, 1) AS pos FROM embeddings)
      |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------- q105
  /** Passage-level exact dedup ([[Dedup.passageDedupStats]], CCNet
    * discipline): 16-token windows, globally-first occurrence kept,
    * per-doc survival counts. The oracle rebuilds the same passages
    * with ordered string_agg and the same (doc, chunk) tie-break. */
  private def q105(s: SparkSession, dir: String): DataFrame =
    Dedup.passageDedupStats(Tables.documents(s, dir), "text", "doc_id", 16)
  private val q105Sql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |         generate_subscripts(string_split(text, ' '), 1) AS idx
      |  FROM documents),
      |passages AS (
      |  SELECT doc_id, (idx - 1) // 16 AS chunk_idx,
      |         string_agg(tok, ' ' ORDER BY idx) AS passage
      |  FROM toks GROUP BY 1, 2),
      |ranked AS (
      |  SELECT doc_id,
      |         row_number() OVER (PARTITION BY passage
      |                            ORDER BY doc_id, chunk_idx) AS rn
      |  FROM passages)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_passages,
      |       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM ranked GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q106
  /** Per-label centroid-distance outliers
    * ([[Similarity.centroidOutliers]]): the 5 vectors farthest from
    * their label centroid, exact scaled-integer distances (vi·cnt −
    * Σvi is an integer, so the squared sum is order-free) — the
    * embedding-cleaning pass before training. */
  private def q106(s: SparkSession, dir: String): DataFrame =
    Similarity.centroidOutliers(
        Tables.embeddings(s, dir), "embedding", "vec_id", "label", 5)
      // the op reports dist2_scaled as exact DECIMAL(38,0) (r7
      // overflow fix); the gate compares as double because DuckDB's
      // pandas bridge folds DECIMAL(38,0)/HUGEINT to float64 anyway
      .withColumn("dist2_scaled", col("dist2_scaled").cast("double"))
  private val q106Sql =
    """WITH ex AS (
      |  SELECT vec_id, label,
      |         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS vi,
      |         generate_subscripts(embedding, 1) AS pos
      |  FROM embeddings),
      |cent AS (
      |  SELECT label, pos, CAST(SUM(vi) AS BIGINT) AS s, COUNT(*) AS c
      |  FROM ex GROUP BY 1, 2),
      |d AS (
      |  SELECT ex.vec_id, ex.label,
      |         CAST(SUM((CAST(vi AS HUGEINT) * c - s) *
      |                  (CAST(vi AS HUGEINT) * c - s)) AS DOUBLE)
      |           AS dist2_scaled,
      |         MAX(c) AS c
      |  FROM ex JOIN cent USING (label, pos) GROUP BY 1, 2)
      |SELECT label, CAST(rn AS INT) AS rank, vec_id, dist2_scaled,
      |       round(sqrt(dist2_scaled) / (c * 1000000.0), 6) AS dist
      |FROM (SELECT *, row_number() OVER (PARTITION BY label
      |        ORDER BY dist2_scaled DESC, vec_id) AS rn FROM d) t
      |WHERE rn <= 5""".stripMargin

  // --------------------------------------------------------- q107
  /** Semantic decontamination ([[Similarity.semanticDecontaminate]]):
    * label 9 plays the held-out benchmark suite; every other vector
    * reports its max benchmark cosine and a >= 0.35 contamination
    * flag. Bench side broadcasts; corpus streams once. */
  private def q107(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.semanticDecontaminate(
      emb.filter(col("label") =!= 9), emb.filter(col("label") === 9),
      "vec_id", "embedding", 0.35)
  }
  private val q107Sql =
    s"""WITH b AS (SELECT embedding::DOUBLE[] AS bv FROM embeddings WHERE label = 9),
       |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE label <> 9)
       |SELECT vec_id, max_cos, max_cos >= 0.35 AS contaminated FROM (
       |  SELECT c.vec_id, round(max(
       |    list_dot_product(bv, v) /
       |    (sqrt(list_dot_product(bv, bv)) * sqrt(list_dot_product(v, v)))), 6) AS max_cos
       |  FROM c, b GROUP BY c.vec_id)""".stripMargin

  // --------------------------------------------------------- q108
  /** Stopword ratio ([[TextAnalysis.stopwordRatio]]) — the Gopher-rule
    * prose/function-word filter, plus the raw counts it derives from.
    * Entirely per-row codegen; zero shuffle. */
  private def q108(s: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.words(col("text"))
    val stops = array(TextAnalysis.Stopwords.map(lit): _*)
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(filter(toks, t => array_contains(stops, t))).cast("long")
        .as("n_stop"),
      TextAnalysis.stopwordRatio(col("text")).as("stop_ratio"))
  }
  private val q108Sql = {
    val list = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST(len(list_filter(string_split(text, ' '),
       |       t -> list_contains([$list], t))) AS BIGINT) AS n_stop,
       |  round(CAST(len(list_filter(string_split(text, ' '),
       |       t -> list_contains([$list], t))) AS DOUBLE)
       |       / len(string_split(text, ' ')), 6) AS stop_ratio
       |FROM documents""".stripMargin
  }

  // --------------------------------------------------------- q109
  /** Asymmetric containment pairs ([[Dedup.containmentVerify]]): same
    * LSH candidates as q28, verified with Broder containment in both
    * directions — catches short-doc-quoted-in-long-doc relations whose
    * Jaccard stays under the q28 threshold. */
  private def q109(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bands = Dedup
      .bandKeys(docs, "text", "doc_id", Bands, RowsPerBand, ShingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.containmentVerify(
      Dedup.candidatePairs(bands), docs, "text", "doc_id", JaccardThreshold)
  }
  private val q109Sql =
    s"""WITH $BandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct($WsSplit) AS toks FROM documents),
       |sc AS (
       |  SELECT id_a, id_b,
       |    len(list_intersect(sa.toks, sb.toks))::DOUBLE / len(sa.toks) AS contain_ab,
       |    len(list_intersect(sa.toks, sb.toks))::DOUBLE / len(sb.toks) AS contain_ba
       |  FROM pairs JOIN sets sa ON id_a = sa.doc_id JOIN sets sb ON id_b = sb.doc_id)
       |SELECT id_a, id_b, round(contain_ab, 4) AS contain_ab,
       |       round(contain_ba, 4) AS contain_ba
       |FROM sc WHERE greatest(contain_ab, contain_ba) >= $JaccardThreshold""".stripMargin

  // --------------------------------------------------------- q110
  /** Token-balanced shard report ([[Layout.tokenBalancedShards]]):
    * docs deal round-robin in (tokens DESC, id) order onto 8 shards;
    * the per-shard rollup shows token totals within one max-doc of
    * each other — the export balance training-step time follows. */
  private def q110(s: SparkSession, dir: String): DataFrame =
    Layout.tokenBalancedShards(Tables.documents(s, dir), "text", "doc_id", 8)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        max(col("n_tokens")).as("max_tokens"))
  private val q110Sql =
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |a AS (
      |  SELECT doc_id, n_tokens,
      |         CAST((row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1) % 8 AS INT) AS shard
      |  FROM t)
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
      |FROM a GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q111
  /** Per-source document cap — the C4/RefinedWeb "max N documents per
    * domain" anti-spam policy: within each source, keep the first
    * `SourceCap` docs in PORTABLE-hash order (Knuth multiplicative on
    * doc_id mod 2³²), so the sample is unbiased w.r.t. crawl/insert
    * order yet any engine reproduces it bit-for-bit — no RNG, no
    * engine-specific hash (the q57 discipline applied to a window).
    * One keyed window on `source`; at 100 TB the per-source row_number
    * never materializes the over-cap tail past the filter. */
  private val SourceCap = 10
  private def q111(s: SparkSession, dir: String): DataFrame = {
    val h = pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))
    val w = Window.partitionBy(col("source")).orderBy(h.asc, col("doc_id").asc)
    Tables.documents(s, dir)
      .withColumn("kept_rank", row_number().over(w).cast("int"))
      .filter(col("kept_rank") <= SourceCap)
      .select(col("doc_id"), col("source"), col("kept_rank"))
  }
  private val q111Sql =
    s"""SELECT doc_id, source, CAST(rn AS INT) AS kept_rank FROM (
       |  SELECT doc_id, source,
       |         ROW_NUMBER() OVER (PARTITION BY source
       |           ORDER BY (doc_id*2654435761)%4294967296, doc_id) AS rn
       |  FROM documents) WHERE rn <= $SourceCap""".stripMargin

  // --------------------------------------------------------- q112
  /** Int8 embedding quantization ([[Similarity.maxAbsQuantize]]):
    * per-vector max-abs scale + 127-step codes in the long (vec_id,
    * pos, code) form the gate can hash. The float-array→int8 compression
    * every vector store runs before shipping; zero shuffles (scale and
    * codes live in the scan's projection). */
  private def q112(s: SparkSession, dir: String): DataFrame =
    Similarity.maxAbsQuantize(Tables.embeddings(s, dir))
  private val q112Sql =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings),
      |s AS (SELECT vec_id, vv,
      |        GREATEST(list_max(list_transform(vv, x -> abs(x))), 1e-12) AS scale
      |      FROM v)
      |SELECT vec_id, CAST(generate_subscripts(vv, 1) - 1 AS INT) AS pos,
      |       CAST(FLOOR(unnest(vv)/scale*127 + 0.5) AS INT) AS code,
      |       round(scale, 6) AS scale
      |FROM s""".stripMargin

  // --------------------------------------------------------- q113
  /** Bloom-prefiltered incremental dedup
    * ([[Dedup.bloomPrefilteredAntiJoin]]): the batch (doc_id ≡ 0 mod 3)
    * dedups against the state corpus (the rest) on a 2-hex-char content
    * fingerprint — coarse on purpose, so the gate exercises BOTH paths
    * (definite-new keeps AND suspect→anti-join drops) on a corpus with
    * no exact dup texts. The oracle is the PLAIN anti-join (`NOT
    * EXISTS`), proving the Bloom split is semantically invisible — the
    * q87 salting discipline applied to dedup. BloomDedupSpec adds the
    * equality proof on synthetic corpora with real duplicate texts. */
  private def q113(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .withColumn("fp", substring(md5(col("text")), 1, 2))
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val state = docs.filter(col("doc_id") % 3 =!= 0)
    Dedup.bloomPrefilteredAntiJoin(batch, state, "fp",
        expectedItems = 10000L, fpp = 0.01)
      .select(col("doc_id"), col("source"), col("fp"))
  }
  private val q113Sql =
    """SELECT b.doc_id, b.source, substr(md5(b.text), 1, 2) AS fp
      |FROM documents b
      |WHERE b.doc_id % 3 = 0 AND NOT EXISTS (
      |  SELECT 1 FROM documents s
      |  WHERE s.doc_id % 3 <> 0
      |    AND substr(md5(s.text), 1, 2) = substr(md5(b.text), 1, 2))""".stripMargin

  // --------------------------------------------------------- q114
  /** Character-entropy quality filter ([[graft.functions.CharEntropy]]):
    * Shannon bits/char per doc — near 0 for `aaaa…` spam, ~4.2 for
    * prose, ~6 for random blobs; the one-pass gibberish detector in the
    * Gopher/C4 family. The kernel and the oracle share the order-free
    * scaled-integer formula (Σ round(c·ln c·1e6) over per-char counts),
    * so the gate is exact. Per-row codegen, zero shuffle. */
  private def q114(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    graft.functions.GraftExtensions.ensureRegistered(s)
    docs.select(col("doc_id"),
      length(col("text")).cast("long").as("len_chars"),
      round(graft.functions.CharEntropy(col("text")), 6).as("entropy_bits"))
  }
  private val q114Sql =
    """WITH chars AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
      |cc AS (SELECT doc_id, ch, count(*)::BIGINT AS c FROM chars GROUP BY 1, 2),
      |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
      |          CAST(sum(CAST(round(c * ln(c) * 1e6) AS BIGINT)) AS BIGINT) AS sclogc
      |        FROM cc GROUP BY 1)
      |SELECT doc_id, n AS len_chars,
      |       round((ln(n) - (sclogc/1e6)/n) / ln(2), 6) AS entropy_bits
      |FROM tot""".stripMargin

  // --------------------------------------------------------- q115
  /** Mixture weights to a target distribution (the data-mixing step of
    * every pretraining recipe, DoReMi-style): given per-language token
    * availability and target shares, the feasible budget is set by the
    * BINDING language (min availᵢ/shareᵢ — no upsampling), and every
    * language's sampling rate follows. Shape: one groupBy bounded by
    * |languages|, a broadcast weights join, and a 1-row broadcast min —
    * the corpus is read once; the rate table is what the downstream
    * sampler (q66's salted-hash discipline) consumes. All divisions are
    * single IEEE ops on exact integer totals, so rates are bit-identical
    * cross-engine. */
  private val MixShares =
    Seq(("en", 0.40), ("de", 0.15), ("es", 0.15), ("fr", 0.15), ("zh", 0.15))
  private def q115(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = MixShares.toDF("lang", "share")
    val avail = Tables.documents(s, dir)
      .groupBy(col("lang"))
      .agg(sum(size(Dedup.words(col("text"))).cast("long")).as("avail_tokens"))
    val lim = avail.join(broadcast(w), "lang")
      .withColumn("limit_b", col("avail_tokens").cast("double") / col("share"))
    val b = lim.agg(min(col("limit_b")).as("budget"))
    lim.crossJoin(broadcast(b))
      .select(col("lang"), col("avail_tokens"), col("share").as("target_share"),
        round((col("budget") * col("share")) / col("avail_tokens").cast("double"), 6)
          .as("rate"),
        floor(col("budget") * col("share")).cast("long").as("take_tokens"))
  }
  private val q115Sql = {
    val values = MixShares
      .map { case (l, p) => s"('$l', ${p}::DOUBLE)" }.mkString(", ")
    s"""WITH w(lang, share) AS (VALUES $values),
       |avail AS (SELECT lang, CAST(SUM(len($WsSplit)) AS BIGINT) AS avail_tokens
       |          FROM documents GROUP BY 1),
       |lim AS (SELECT a.lang, a.avail_tokens, w.share,
       |          a.avail_tokens::DOUBLE / w.share AS limit_b
       |        FROM avail a JOIN w USING (lang)),
       |b AS (SELECT MIN(limit_b) AS budget FROM lim)
       |SELECT lang, avail_tokens, share AS target_share,
       |       round((budget * share) / avail_tokens::DOUBLE, 6) AS rate,
       |       CAST(FLOOR(budget * share) AS BIGINT) AS take_tokens
       |FROM lim CROSS JOIN b""".stripMargin
  }

  // --------------------------------------------------------- q116
  /** Quality-decile mixing report: docs decile'd by char entropy
    * ([[graft.functions.CharEntropy]]) with per-decile size, entropy
    * range and mean length — the bucket table a quality-mixed sampler
    * (Llama/Falcon-style "mix by quality band") draws from. The decile
    * assignment is [[Layout.globalNtile]] — ntile semantics WITHOUT the
    * single-task global window (two-pass rank; see SCALE.md). Mean
    * length divides two exact integers once, so every double is one
    * IEEE op from ints. */
  private def q116(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val e = Tables.documents(s, dir).select(col("doc_id"),
      length(col("text")).cast("long").as("n"),
      round(graft.functions.CharEntropy(col("text")), 6).as("ent"))
    Layout.globalNtile(e, 10, col("ent").asc, col("doc_id").asc)
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("ent")).as("min_entropy"), max(col("ent")).as("max_entropy"),
        round(sum(col("n")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("avg_len"))
      .withColumnRenamed("tile", "decile")
  }
  private val q116Sql =
    """WITH chars AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
      |cc AS (SELECT doc_id, ch, count(*)::BIGINT AS c FROM chars GROUP BY 1, 2),
      |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
      |          CAST(sum(CAST(round(c * ln(c) * 1e6) AS BIGINT)) AS BIGINT) AS s
      |        FROM cc GROUP BY 1),
      |e AS (SELECT doc_id, n, round((ln(n) - (s/1e6)/n) / ln(2), 6) AS ent FROM tot),
      |d AS (SELECT doc_id, n, ent,
      |        ntile(10) OVER (ORDER BY ent, doc_id) AS decile FROM e)
      |SELECT CAST(decile AS INT) AS decile,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       MIN(ent) AS min_entropy, MAX(ent) AS max_entropy,
      |       round(CAST(SUM(n) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_len
      |FROM d GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q117
  /** Boilerplate-passage detection ([[Dedup.boilerplateStats]], the
    * C4/CCNet template filter): passages recurring in >= 2 distinct
    * docs are boilerplate; each doc reports its passage count and
    * boilerplate fraction. Same 16-token passages as q105 — the oracle
    * rebuilds them with ordered string_agg — plus a doc-frequency
    * aggregation and a flag join keyed on the passage text. */
  private val BoilerMinDocs = 2
  private def q117(s: SparkSession, dir: String): DataFrame =
    Dedup.boilerplateStats(Tables.documents(s, dir), "text", "doc_id",
      16, BoilerMinDocs)
  private val q117Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
       |         generate_subscripts(string_split(text, ' '), 1) AS idx
       |  FROM documents),
       |passages AS (
       |  SELECT doc_id, (idx - 1) // 16 AS chunk_idx,
       |         string_agg(tok, ' ' ORDER BY idx) AS passage
       |  FROM toks GROUP BY 1, 2),
       |df AS (
       |  SELECT passage, count(DISTINCT doc_id) AS df
       |  FROM passages GROUP BY 1)
       |SELECT p.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_passages,
       |  CAST(SUM(CASE WHEN df >= $BoilerMinDocs THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_boiler,
       |  round(CAST(SUM(CASE WHEN df >= $BoilerMinDocs THEN 1 ELSE 0 END)
       |          AS DOUBLE) / COUNT(*), 6) AS boiler_frac
       |FROM passages p JOIN df USING (passage)
       |GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q118
  /** SemDeDup within-corpus semantic near-dup pairs
    * ([[Similarity.semDedupPairs]], Abbas et al. 2023): every vector
    * coarse-quantized to its nearest of the 8 lowest-id embeddings
    * (q43's deterministic quantizer), cosine compared ONLY inside its
    * cell, pairs >= 0.35 reported with id_a < id_b. Comparison cost is
    * sum over cells of |cell|^2, never N^2 — the oracle replays the
    * assignment and the within-cell pair join verbatim. */
  private[queries] val SemDedupTau = 0.35
  private def q118(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedupPairs(Tables.embeddings(s, dir), IvfClusters,
      SemDedupTau)
  private val q118Sql =
    s"""WITH cents AS (SELECT vec_id AS cluster, embedding::DOUBLE[] AS c
       |               FROM embeddings ORDER BY vec_id LIMIT $IvfClusters),
       |base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, v, cluster FROM (
       |    SELECT b.vec_id, b.v, cents.cluster,
       |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |        ORDER BY ${distSql("b.v", "cents.c")} ASC, cents.cluster ASC)
       |        AS rn
       |    FROM base b, cents) WHERE rn = 1)
       |SELECT id_a, id_b, round(cos, 6) AS cos_sim FROM (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) *
       |       sqrt(list_dot_product(b.v, b.v))) AS cos
       |  FROM assigned a JOIN assigned b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
       |WHERE cos >= $SemDedupTau""".stripMargin

  // --------------------------------------------------------- q122
  /** SemDeDup keep policy ([[Similarity.semDedupKeep]]): the q118
    * pair graph resolved to transitive clusters (the same
    * connected-components machinery as q50), lowest id kept per
    * cluster — the actual prune decision SemDeDup ships. The oracle
    * replays the pair CTE chain and closes it with a recursive
    * reachability CTE, exactly the q50 discipline. */
  private def q122(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedupKeep(Tables.embeddings(s, dir), IvfClusters,
      SemDedupTau)
  /** q122's oracle with the CORPUS membership parameterized — shared
    * with the maintained-SemDeDup gates (CurationQueries q283/q285;
    * the RTBF gate q284 instead uses the q253-shaped seeded-reach
    * variant, because [[graft.ops.CcState.deleteNodes]] deliberately
    * keeps orphaned survivors as singleton labels). The centroid CTE
    * stays UNFILTERED deliberately: the maintained composition pins
    * its quantizer at write time. */
  private[queries] def q122SqlWhere(basePred: String): String =
    s"""WITH RECURSIVE ${semKeepCtes(basePred)}
       |SELECT node AS vec_id, CAST(MIN(r) AS BIGINT) AS cluster_rep,
       |       node = MIN(r) AS kept
       |FROM reach GROUP BY node""".stripMargin
  /** The q122 CTE chain (assignment → pairs → recursive reachability)
    * without the `WITH RECURSIVE` prefix or final SELECT — shared with
    * the maintained-state funnel oracle (CurationQueries q295). */
  private[queries] def semKeepCtes(basePred: String): String =
    s"""cents AS (SELECT vec_id AS cluster, embedding::DOUBLE[] AS c
       |               FROM embeddings ORDER BY vec_id LIMIT $IvfClusters),
       |base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings$basePred),
       |assigned AS (
       |  SELECT vec_id, v, cluster FROM (
       |    SELECT b.vec_id, b.v, cents.cluster,
       |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |        ORDER BY ${distSql("b.v", "cents.c")} ASC, cents.cluster ASC)
       |        AS rn
       |    FROM base b, cents) WHERE rn = 1),
       |vpairs AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |      list_dot_product(a.v, b.v) /
       |        (sqrt(list_dot_product(a.v, a.v)) *
       |         sqrt(list_dot_product(b.v, b.v))) AS cos
       |    FROM assigned a JOIN assigned b
       |      ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
       |  WHERE cos >= $SemDedupTau),
       |edges AS (SELECT id_a AS s, id_b AS d FROM vpairs
       |          UNION ALL SELECT id_b, id_a FROM vpairs),
       |reach AS (SELECT DISTINCT s AS node, s AS r FROM edges
       |          UNION
       |          SELECT e.s, r.r FROM edges e JOIN reach r ON r.node = e.d)""".stripMargin
  private[queries] val q122Sql = q122SqlWhere("")

  // --------------------------------------------------------- q123
  /** Near-dup candidate-graph degree histogram
    * ([[graft.ops.Graphs.degrees]] over q27's LSH candidate pairs):
    * how many docs have how many near-dup candidates — the shape
    * report that tells a dedup operator whether banding is producing
    * tight families (degree 1-2) or storm clusters (heavy tail). */
  private def q123(s: SparkSession, dir: String): DataFrame = {
    val bands = Dedup.bandKeys(Tables.documents(s, dir), "text", "doc_id",
      Bands, RowsPerBand, ShingleK)
    graft.ops.Graphs.degrees(Dedup.candidatePairs(bands))
      .groupBy(col("degree"))
      .agg(count(lit(1)).as("n_nodes"))
  }
  private val q123Sql =
    s"""WITH $BandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |deg AS (
       |  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
       |    SELECT id_a AS node FROM pairs UNION ALL SELECT id_b FROM pairs)
       |  GROUP BY node)
       |SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
       |FROM deg GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q125
  /** Deterministic weighted corpus draw
    * ([[graft.ops.Layout.weightedPrioritySample]]): the 20 documents
    * drawn with probability ∝ token count — Efraimidis–Spirakis
    * priority sampling with a seed-free md5 uniform, so the drawn set
    * is reproducible on any engine or partitioning. Scores are the
    * rank key `ln(u)/w`, rounded BEFORE the top-k cut (q96 rule). */
  private val SampleK = 20
  private def q125(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"),
      graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")
        .as("n_tokens"))
    graft.ops.Layout.weightedPrioritySample(d, "doc_id", "n_tokens", SampleK)
  }
  private val q125Sql =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS h
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, n_tokens,
       |    round(ln((h + 1) / 281474976710656.0) / n_tokens, 6) AS score
       |  FROM d WHERE n_tokens > 0)
       |SELECT doc_id, n_tokens, score FROM s
       |ORDER BY score DESC, doc_id LIMIT $SampleK""".stripMargin

  // --------------------------------------------------------- q127
  /** N-gram novelty scores ([[TextAnalysis.ngramNovelty]]): per doc,
    * the fraction of its distinct 3-shingles first owned (min doc id)
    * by itself — the pairless originality metric. Oracle rebuilds the
    * inverted first-owner index verbatim. */
  private def q127(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.ngramNovelty(Tables.documents(s, dir), "text", "doc_id", 3)
  private val q127Sql =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, unnest($ShinglesSql) AS g FROM documents),
       |own AS (SELECT g, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
       |SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |  round(CAST(SUM(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
       |          AS DOUBLE) / COUNT(*), 6) AS novelty_frac
       |FROM sh JOIN own USING (g) GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q128
  /** Fraction-based n-gram decontamination
    * ([[Dedup.ngramDecontaminate]] — the PaLM ≥X%-of-n-grams policy,
    * vs q61's GPT-3 any-hit policy): source `src0` plays the held-out
    * benchmark suite (the q107 convention, lexical edition); every
    * other document reports its distinct-5-shingle count, benchmark
    * hits, and hit fraction. k=5 on this corpus flags only genuine
    * cross-source duplicates. */
  private val DecontamK = 5
  private def q128(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    Dedup.ngramDecontaminate(
      d.filter(col("source") =!= "src0"), d.filter(col("source") === "src0"),
      "text", "doc_id", DecontamK)
  }
  private val q128Sql =
    s"""WITH tsh AS (
       |  SELECT DISTINCT doc_id, unnest(${shinglesSqlK(DecontamK)}) AS g
       |  FROM documents WHERE source <> 'src0'),
       |esh AS (
       |  SELECT DISTINCT unnest(${shinglesSqlK(DecontamK)}) AS g
       |  FROM documents WHERE source = 'src0')
       |SELECT tsh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |  CAST(SUM(CASE WHEN esh.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_hits,
       |  round(CAST(SUM(CASE WHEN esh.g IS NOT NULL THEN 1 ELSE 0 END)
       |          AS DOUBLE) / COUNT(*), 6) AS hit_frac
       |FROM tsh LEFT JOIN esh ON tsh.g = esh.g GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q129
  /** Per-dimension embedding statistics
    * ([[Similarity.dimensionStats]]): exact mean and population
    * variance for each of the 64 dimensions — the whitening /
    * standardization inputs. Scaled-integer moment sums keep the
    * result bit-identical across engines and partitionings; the
    * oracle rebuilds the identical E[x²]−E[x]² double expression. */
  private def q129(s: SparkSession, dir: String): DataFrame =
    Similarity.dimensionStats(Tables.embeddings(s, dir), "embedding")
  private val q129Sql =
    """WITH x AS (
      |  SELECT CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
      |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT)
      |      AS sv
      |  FROM embeddings)
      |SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
      |  round(CAST(SUM(sv) AS DOUBLE) / COUNT(*) / 1000000.0, 6) AS mean,
      |  round((CAST(SUM(sv * sv) AS DOUBLE) / COUNT(*) -
      |      (CAST(SUM(sv) AS DOUBLE) / COUNT(*)) *
      |      (CAST(SUM(sv) AS DOUBLE) / COUNT(*))) / 1000000000000.0, 6)
      |    AS variance
      |FROM x GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q130
  /** Deterministic PageRank ([[graft.ops.Graphs.pageRank]]) over the
    * LSH candidate graph (q27's bands → q28's pairs): which documents
    * hub their near-dup families. Scores are 10¹²-scaled longs with
    * per-edge rounding, so the oracle — the same recursion unrolled
    * as one CTE per iteration — reproduces them bit-for-bit. */
  private val PrIters = 5
  private def q130(s: SparkSession, dir: String): DataFrame = {
    val bands = Dedup.bandKeys(Tables.documents(s, dir), "text", "doc_id",
      Bands, RowsPerBand, ShingleK)
    graft.ops.Graphs.pageRank(Dedup.candidatePairs(bands), PrIters)
  }
  private val q130Sql = {
    val iterCtes = (1 to PrIters).map { i =>
      s"""p$i AS (
         |  SELECT ed.dst AS node, d.outdeg,
         |    CAST((SELECT CAST(round(0.15 * 1000000000000.0 / n.n, 0) AS BIGINT) FROM n)
         |      + SUM(CAST(round(p.s * 0.85 / p.outdeg, 0) AS BIGINT)) AS BIGINT) AS s
         |  FROM ed JOIN p${i - 1} p ON ed.src = p.node
         |    JOIN deg d ON ed.dst = d.node
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH $BandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |ed AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |       UNION ALL SELECT id_b, id_a FROM pairs),
       |deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
       |        FROM ed GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n FROM deg),
       |p0 AS (SELECT node, outdeg,
       |         CAST(round(1000000000000.0 / n.n, 0) AS BIGINT) AS s
       |       FROM deg, n),
       |$iterCtes
       |SELECT node, round(s / 1000000000000.0, 6) AS rank
       |FROM p$PrIters""".stripMargin
  }

  // --------------------------------------------------------- q131
  /** Hybrid retrieval with reciprocal-rank fusion
    * ([[Similarity.rrfFuse]]): the q49 BM25 list and a cosine list
    * against probe vector 0, each cut to the top `RrfN` by ROUNDED
    * score with id tie-break (q96 rule), fused as Σ 1/(60+rank).
    * The ranks are assigned by [[Layout.globalRank]] — the window-free
    * two-pass rank — over parameter-bounded candidate lists (≤ RrfN
    * rows after TakeOrderedAndProject), never the corpus; no
    * unpartitioned WindowExec appears anywhere in the plan. */
  private val RrfN = 50
  private[queries] val RrfTopK = 15
  private def q131(s: SparkSession, dir: String): DataFrame = {
    val lexN = TextAnalysis.bm25(Tables.documents(s, dir), "text", "doc_id",
        Bm25Terms)
      .select(col("doc_id"), round(col("score"), 6).as("s"))
      .orderBy(col("s").desc, col("doc_id")).limit(RrfN)
    val lex = Layout.globalRank(lexN, col("s").desc, col("doc_id"))
      .select(col("doc_id"), col("rank"))
    val emb = Tables.embeddings(s, dir)
    val probe = emb.filter(col("vec_id") === 0)
      .select(Similarity.toDouble(col("embedding")).as("qv"))
    val semN = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id").as("doc_id"),
        round(Similarity.cosine(Similarity.toDouble(col("embedding")),
          col("qv")), 6).as("c"))
      .orderBy(col("c").desc, col("doc_id")).limit(RrfN)
    val sem = Layout.globalRank(semN, col("c").desc, col("doc_id"))
      .select(col("doc_id"), col("rank"))
    Similarity.rrfFuse(Seq(lex, sem), "doc_id", "rank")
      .withColumnRenamed("r_0", "r_lex").withColumnRenamed("r_1", "r_sem")
      .orderBy(col("rrf").desc, col("doc_id")).limit(RrfTopK)
  }
  private val q131Sql =
    s"""WITH $Bm25CoreSql,
       |lexn AS (SELECT doc_id, score FROM bm
       |         ORDER BY score DESC, doc_id LIMIT $RrfN),
       |lex AS (SELECT doc_id, CAST(ROW_NUMBER() OVER
       |          (ORDER BY score DESC, doc_id) AS BIGINT) AS r_lex FROM lexn),
       |qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |      WHERE vec_id <> 0),
       |cosv AS (SELECT vec_id AS doc_id, round($CosSql, 6) AS c FROM c, qv),
       |semn AS (SELECT doc_id, c FROM cosv ORDER BY c DESC, doc_id LIMIT $RrfN),
       |sem AS (SELECT doc_id, CAST(ROW_NUMBER() OVER
       |          (ORDER BY c DESC, doc_id) AS BIGINT) AS r_sem FROM semn)
       |SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, r_lex, r_sem,
       |  round(COALESCE(1.0 / (60 + r_lex), 0.0) +
       |        COALESCE(1.0 / (60 + r_sem), 0.0), 6) AS rrf
       |FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
       |ORDER BY rrf DESC, COALESCE(lex.doc_id, sem.doc_id) LIMIT $RrfTopK""".stripMargin

  // --------------------------------------------------------- q132
  /** Source-mixture drift report ([[Layout.sourceDrift]]): even
    * doc_ids play the previous crawl snapshot, odd the current one;
    * per source, exact token masses, shares, and the KL(B‖A) term.
    * One fixed double tree over exact longs — bit-identical ranks. */
  private def q132(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("t"))
    Layout.sourceDrift(
      d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 =!= 0),
      "source", "t")
  }
  private val q132Sql =
    """WITH pa AS (
      |  SELECT source,
      |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
      |      AS toks_a
      |  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
      |pb AS (
      |  SELECT source,
      |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
      |      AS toks_b
      |  FROM documents WHERE doc_id % 2 <> 0 GROUP BY 1),
      |per AS (
      |  SELECT pa.source, toks_a, toks_b FROM pa JOIN pb ON pa.source = pb.source
      |  WHERE toks_a > 0 AND toks_b > 0),
      |tot AS (
      |  SELECT CAST(SUM(toks_a) AS BIGINT) AS ta,
      |    CAST(SUM(toks_b) AS BIGINT) AS tb FROM per)
      |SELECT source, toks_a, toks_b,
      |  round(CAST(toks_a AS DOUBLE) / ta, 6) AS share_a,
      |  round(CAST(toks_b AS DOUBLE) / tb, 6) AS share_b,
      |  round((CAST(toks_b AS DOUBLE) / tb) *
      |    ln((CAST(toks_b AS DOUBLE) / tb) / (CAST(toks_a AS DOUBLE) / ta)), 6)
      |    AS kl_term
      |FROM per, tot""".stripMargin

  // --------------------------------------------------------- q133
  /** EXACT all-pairs 3-gram Jaccard join ([[Dedup.prefixFilterPairs]],
    * AllPairs/PPJoin prefix filtering): every pair ≥ 0.5, provably
    * complete — the oracle is the brute-force all-pairs join, so the
    * gate itself proves the no-false-negatives contract that LSH
    * (q28) can only approximate. */
  private def q133(s: SparkSession, dir: String): DataFrame =
    Dedup.prefixFilterPairs(Tables.documents(s, dir), "text", "doc_id",
      ShingleK, JaccardThreshold)
  private val q133Sql =
    s"""WITH tok AS (
       |  SELECT DISTINCT doc_id, unnest($ShinglesSql) AS w FROM documents),
       |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS c
       |  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 4) AS jaccard
       |FROM inter JOIN sz sa ON inter.id_a = sa.doc_id
       |  JOIN sz sb ON inter.id_b = sb.doc_id
       |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $JaccardThreshold""".stripMargin

  // --------------------------------------------------------- q134
  /** Exact heavy-hitter tokens ([[Freq.exactHeavyHitters]], two-pass
    * Misra–Gries): every token with count ≥ max(10, N/1000), exact —
    * vocabulary pruning / stopword discovery without a full-vocabulary
    * shuffle. Pass 1 is a driver-bounded mergeable sketch (4096
    * counters, provable candidate superset since the threshold clears
    * N/(k+1)); pass 2 recounts only candidate occurrences. The
    * order-sensitive sketch never reaches the output, so the result is
    * deterministic and the oracle is the plain GROUP BY ... HAVING. */
  private val HhSummaryK = 4096
  private def q134(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(TextAnalysis.words(col("text"))).as("w"))
    Freq.exactHeavyHitters(toks, "w", HhSummaryK)(n => math.max(10L, n / 1000))
      .select(col("w").as("token"), col("cnt"))
  }
  private val q134Sql =
    s"""WITH tok AS (SELECT unnest($WsSplit) AS w FROM documents),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok)
       |SELECT w AS token, CAST(count(*) AS BIGINT) AS cnt
       |FROM tok, tot GROUP BY w, n
       |HAVING count(*) >= greatest(10, n // 1000)""".stripMargin

  // --------------------------------------------------------- q135
  /** Linear-classifier inference ([[Similarity.linearArgmax]]): a
    * 4-class fastText/logreg-style head scored over every embedding —
    * the corpus-wide quality/domain classification pass (CCNet, Llama
    * wiki-likeness). Weights are exact binary fractions (eighths and
    * quarters) from a fixed integer formula, inlined as literals in
    * BOTH engines, so each dot product is bit-identical and the argmax
    * can compare unrounded doubles. Zero shuffle — the whole model
    * rides the scan projection. */
  private val ClfClasses = 4
  private val ClfDims = 64
  private val ClfWeights: Seq[Seq[Double]] = (0 until ClfClasses).map(c =>
    (0 until ClfDims).map(d => ((c * 31 + d * 17) % 13 - 6) / 8.0))
  private val ClfBias: Seq[Double] =
    (0 until ClfClasses).map(c => ((c * 7) % 5 - 2) / 4.0)
  private def q135(s: SparkSession, dir: String): DataFrame = {
    // two-step: materialize the 64-term scores as columns first, then
    // argmax over cheap refs — inlining them at every argmax reference
    // multiplies the generated code ~2^C times (raw float column in;
    // linearScores casts per element, keeping the projection codegen'd)
    val scoreCols = Similarity.linearScores(col("embedding"),
      ClfWeights, ClfBias)
    val scored = Tables.embeddings(s, dir).select(
      col("vec_id") +: col("label") +:
        scoreCols.zipWithIndex.map { case (c, i) => c.as(s"s$i") }: _*)
    val best = Similarity.argmaxStruct(
      (0 until ClfClasses).map(i => col(s"s$i")))
    scored.select(col("vec_id"), col("label"),
      best.getField("c").cast("int").as("pred"),
      round(best.getField("s"), 6).as("score"))
  }
  private val q135Sql = {
    def wlist(c: Int) = ClfWeights(c).mkString("[", ", ", "]")
    val sCols = (0 until ClfClasses).map(c =>
      s"list_dot_product(v, ${wlist(c)}) + ${ClfBias(c)} AS s$c").mkString(",\n|    ")
    // first-strict-max argmax: class i wins iff it strictly beats every
    // lower class — same tie rule as linearArgmax's left-scan
    s"""WITH v AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (SELECT vec_id, label,
       |    $sCols
       |  FROM v)
       |SELECT vec_id, label,
       |  CAST(CASE WHEN s3 > greatest(s0, s1, s2) THEN 3
       |            WHEN s2 > greatest(s0, s1) THEN 2
       |            WHEN s1 > s0 THEN 1 ELSE 0 END AS INT) AS pred,
       |  round(greatest(s0, s1, s2, s3), 6) AS score
       |FROM s""".stripMargin
  }

  // --------------------------------------------------------- q136
  /** Sorted-neighborhood blocking ([[Dedup.sortedNeighborhoodPairs]],
    * Hernández–Stolfo): customers sorted by name, each paired with the
    * next `SnWindow` in the order, kept when the names are within
    * edit distance `SnMaxLev` — the order-based candidate generator for
    * entity resolution. The oracle rebuilds it as the single-task
    * ROW_NUMBER window + rank-range self-join this op exists to avoid. */
  private val SnWindow = 2
  private val SnMaxLev = 1
  private def q136(s: SparkSession, dir: String): DataFrame =
    Dedup.sortedNeighborhoodPairs(
      Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
      "c_custkey", "c_name", SnWindow)
    .withColumn("lev", levenshtein(col("key_a"), col("key_b")).cast("long"))
    .filter(col("lev") <= SnMaxLev)
    .select(col("id_a"), col("id_b"), col("lev"))
  private val q136Sql =
    s"""WITH r AS (
       |  SELECT c_custkey, c_name,
       |    ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS rn
       |  FROM customer)
       |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev
       |FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + $SnWindow
       |WHERE levenshtein(a.c_name, b.c_name) <= $SnMaxLev""".stripMargin

  // --------------------------------------------------------- q137
  /** Distributed k-means ([[Similarity.kmeans]]): 2 Lloyd iterations,
    * k=4, lowest-id seeds — the full clustering loop gate-exact. The
    * oracle unrolls both iterations CTE-by-CTE (q130's pattern):
    * cross-join + rank-1 window for each E-step (the kernel's
    * v·v − 2v·c + c·c in the same fold order), scaled-integer moment
    * sums for each M-step, `s/n/10⁶` codebook rebuild in the same
    * division order. */
  private[queries] val KmK = 4
  private[queries] val KmIters = 2
  private def q137(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeans(Tables.embeddings(s, dir), "embedding", "vec_id",
      KmK, KmIters)
  private def kmEstepSql(centsRel: String) =
    s"""SELECT vec_id, v, cl AS cluster FROM (
       |    SELECT e.vec_id, e.v, $centsRel.cl,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${distSql("e.v", s"$centsRel.c")} ASC,
       |          $centsRel.cl ASC) AS rn
       |    FROM e, $centsRel) WHERE rn = 1""".stripMargin
  private def kmMstepSql(assignRel: String) =
    s"""SELECT cluster, pos,
       |    CAST(SUM(CAST(round(vel * 1000000) AS BIGINT)) AS BIGINT) AS s,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM (SELECT cluster, unnest(v) AS vel,
       |          generate_subscripts(v, 1) AS pos FROM $assignRel)
       |  GROUP BY 1, 2""".stripMargin
  /** The 2-iteration Lloyd unroll as a reusable CTE chain (`e` →
    * `seed` → `a1` → `m1` → `c2` → `a2` → `m2`) — shared by q137's
    * moment output and the maintained-SemDeDup re-quantization gate
    * (CurationQueries q286), whose oracle rebuilds the refined
    * codebook from `m2` exactly as [[Similarity.kmeans]]'s driver
    * loop does. */
  private[queries] val KmUnrolledCtes: String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |seed AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, v AS c
       |         FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $KmK)),
       |a1 AS (${kmEstepSql("seed")}),
       |m1 AS (${kmMstepSql("a1")}),
       |c2 AS (SELECT cluster AS cl,
       |         list(CAST(s AS DOUBLE) / n / 1000000.0 ORDER BY pos) AS c
       |       FROM m1 GROUP BY 1),
       |a2 AS (${kmEstepSql("c2")}),
       |m2 AS (${kmMstepSql("a2")})""".stripMargin
  private val q137Sql =
    s"""WITH $KmUnrolledCtes
       |SELECT cluster, CAST(pos - 1 AS INT) AS pos, s AS sum_scaled,
       |  n AS cnt, round(CAST(s AS DOUBLE) / n / 1000000.0, 6) AS centroid
       |FROM m2""".stripMargin

  // --------------------------------------------------------- q138
  /** Cross-source near-dup overlap matrix: per source pair, how many
    * distinct 8-token-prefix fingerprints they share — the cross-crawl
    * contamination diagnostic run before mixing sources (a high count
    * means two "independent" sources are republishing the same
    * content). Distinct (source, fp) first (one keyed shuffle), then a
    * fingerprint equi-join and a |sources|²-bounded aggregation —
    * never a doc×doc comparison. */
  private val XsPrefixTokens = 8
  private def q138(s: SparkSession, dir: String): DataFrame = {
    val h = Tables.documents(s, dir).select(col("source"),
        md5(concat_ws(" ",
          slice(TextAnalysis.words(col("text")), 1, XsPrefixTokens)))
          .as("h"))
      .distinct()
    h.as("a").join(h.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }
  private val q138Sql =
    s"""WITH h AS (
       |  SELECT DISTINCT source,
       |    md5(array_to_string($WsSplit[1:$XsPrefixTokens], ' ')) AS h
       |  FROM documents)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  CAST(count(*) AS BIGINT) AS n_shared
       |FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
       |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------- q139
  /** Per-source modal language: the most frequent lang per source with
    * its count — the majority-vote roll-up (cluster labeling, shard
    * routing) WITHOUT a window: two keyed aggregations, the argmax as
    * `min(struct(-cnt, lang))` so the struct order (highest count,
    * lowest lang on ties) is total and engine-reproducible. The oracle
    * is the rank-1 window this formulation avoids at scale. */
  private def q139(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(min(struct((-col("cnt")).as("nc"), col("lang").as("lang"))).as("m"))
      .select(col("source"), col("m.lang").as("lang"),
        (-col("m.nc")).as("cnt"))
  private val q139Sql =
    """WITH c AS (
      |  SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
      |  FROM documents GROUP BY 1, 2)
      |SELECT source, lang, cnt FROM (
      |  SELECT source, lang, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |                       ORDER BY cnt DESC, lang ASC) AS rn
      |  FROM c) WHERE rn = 1""".stripMargin

  // --------------------------------------------------------- q140
  /** Weighted score fusion — the OTHER standard hybrid-retrieval
    * merge (Vespa/Weaviate "alpha" fusion) next to q131's RRF: each
    * candidate list is min-max normalized over ITS OWN top-N cut
    * (1-row stats broadcast), then fused as α·lex + (1−α)·sem with
    * absent-list terms contributing 0. Same bounded shape as q131 —
    * the corpus is scanned once per retriever, windows and stats only
    * ever see ≤ N candidate rows. Ranks over the ROUNDED fused score
    * with id tie-break (q96 rule). */
  private[queries] val FuseAlpha = 0.7
  private[queries] val FuseBeta = 0.3 // 1 − α, spelled exactly (1-0.7 ≠ 0.3 in binary)
  private def q140(s: SparkSession, dir: String): DataFrame = {
    val lexN = TextAnalysis.bm25(Tables.documents(s, dir), "text", "doc_id",
        Bm25Terms)
      .select(col("doc_id"), round(col("score"), 6).as("sc"))
      .orderBy(col("sc").desc, col("doc_id")).limit(RrfN)
    val emb = Tables.embeddings(s, dir)
    val probe = emb.filter(col("vec_id") === 0)
      .select(Similarity.toDouble(col("embedding")).as("qv"))
    val semN = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id").as("doc_id"),
        round(Similarity.cosine(Similarity.toDouble(col("embedding")),
          col("qv")), 6).as("cs"))
      .orderBy(col("cs").desc, col("doc_id")).limit(RrfN)
    val lex = lexN.crossJoin(broadcast(
        lexN.agg(min(col("sc")).as("lo"), max(col("sc")).as("hi"))))
      .select(col("doc_id"),
        ((col("sc") - col("lo")) / nullif(col("hi") - col("lo"), lit(0.0)))
          .as("nl"))
    val sem = semN.crossJoin(broadcast(
        semN.agg(min(col("cs")).as("lo"), max(col("cs")).as("hi"))))
      .select(col("doc_id"),
        ((col("cs") - col("lo")) / nullif(col("hi") - col("lo"), lit(0.0)))
          .as("ns"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(coalesce(lit(FuseAlpha) * col("nl"), lit(0.0)) +
          coalesce(lit(FuseBeta) * col("ns"), lit(0.0)), 6).as("fused"))
      .orderBy(col("fused").desc, col("doc_id")).limit(RrfTopK)
  }
  private val q140Sql =
    s"""WITH $Bm25CoreSql,
       |lexn AS (SELECT doc_id, score AS sc FROM bm
       |         ORDER BY sc DESC, doc_id LIMIT $RrfN),
       |qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |cv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |       WHERE vec_id <> 0),
       |semn AS (SELECT doc_id, cs FROM (
       |           SELECT vec_id AS doc_id, round($CosSql, 6) AS cs FROM cv c, qv)
       |         ORDER BY cs DESC, doc_id LIMIT $RrfN),
       |lex AS (SELECT doc_id,
       |          (sc - (SELECT min(sc) FROM lexn)) /
       |            NULLIF((SELECT max(sc) FROM lexn) -
       |                   (SELECT min(sc) FROM lexn), 0.0) AS nl
       |        FROM lexn),
       |sem AS (SELECT doc_id,
       |          (cs - (SELECT min(cs) FROM semn)) /
       |            NULLIF((SELECT max(cs) FROM semn) -
       |                   (SELECT min(cs) FROM semn), 0.0) AS ns
       |        FROM semn)
       |SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
       |  round(COALESCE($FuseAlpha * nl, 0.0) +
       |        COALESCE($FuseBeta * ns, 0.0), 6) AS fused
       |FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
       |ORDER BY fused DESC, COALESCE(lex.doc_id, sem.doc_id)
       |LIMIT $RrfTopK""".stripMargin

  // --------------------------------------------------------- q141
  /** Deterministic per-group sample: k docs per source by the
    * seed-free md5 uniform (q57/q125 discipline), rank-1..k inside
    * each group — the per-stratum eyeball/eval sample every curation
    * run exports. The per-group top-k plans as a WindowGroupLimit
    * (per-partition heads, q111 precedent), never a global sort. */
  private val GroupSampleK = 5
  private def q141(s: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
      .cast("long")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h").asc, col("doc_id").asc)
    Tables.documents(s, dir).select(col("source"), col("doc_id"), h.as("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= GroupSampleK)
      .select(col("source"), col("doc_id"), col("rn"))
  }
  private val q141Sql =
    s"""WITH d AS (
       |  SELECT source, doc_id,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS h
       |  FROM documents)
       |SELECT source, doc_id, CAST(rn AS INT) AS rn FROM (
       |  SELECT source, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
       |  FROM d) WHERE rn <= $GroupSampleK""".stripMargin

  // --------------------------------------------------------- q142
  /** Sequence packing ([[Layout.globalCumsum]]): concatenate the corpus
    * in doc_id order and chop into fixed `CtxTokens`-token training
    * contexts — per doc, its global start offset, first context id and
    * how many contexts it spans (the GPT-style pack-and-chop layout).
    * Pure integer arithmetic over the windowless running sum, so the
    * oracle's single-task `SUM() OVER` window is reproduced exactly by
    * the two-pass offsets. */
  private val CtxTokens = 64
  private def q142(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(s, dir).select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    Layout.globalCumsum(t, "n_tokens", col("doc_id").asc)
      .select(col("doc_id"), col("n_tokens"),
        (col("cumsum") - col("n_tokens")).as("start_offset"),
        expr(s"(cumsum - n_tokens) div $CtxTokens").as("ctx_id"),
        expr(s"((cumsum - 1) div $CtxTokens) - " +
          s"((cumsum - n_tokens) div $CtxTokens) + 1").as("n_spanned"))
  }
  private val q142Sql =
    s"""WITH t AS (
       |  SELECT doc_id, CAST(len($WsSplit) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       |        SUM(n_tokens) OVER (ORDER BY doc_id) AS cum FROM t)
       |SELECT doc_id, n_tokens,
       |  CAST(cum - n_tokens AS BIGINT) AS start_offset,
       |  CAST((cum - n_tokens) // $CtxTokens AS BIGINT) AS ctx_id,
       |  CAST(((cum - 1) // $CtxTokens) -
       |       ((cum - n_tokens) // $CtxTokens) + 1 AS BIGINT) AS n_spanned
       |FROM c""".stripMargin

  // --------------------------------------------------------- q143
  /** Substring-duplication stats ([[Dedup.substringDupStats]], the
    * Lee et al. exact-substring-dedup metric): per doc, duplicated
    * stride-1 8-token window positions and the longest verbatim run
    * shared with another document. The oracle rebuilds the windows,
    * doc frequencies and gaps-and-islands in SQL. */
  private val SubDupW = 8
  private def q143(s: SparkSession, dir: String): DataFrame =
    Dedup.substringDupStats(Tables.documents(s, dir), "text", "doc_id",
      SubDupW)
  private val q143Sql =
    s"""WITH sp AS (SELECT doc_id, $WsSplit AS a FROM documents),
       |w AS (
       |  SELECT doc_id, pos,
       |    md5(array_to_string(a[pos:pos+$SubDupW-1], ' ')) AS wh
       |  FROM (SELECT doc_id, a, unnest(range(1, len(a) - $SubDupW + 2)) AS pos
       |        FROM sp WHERE len(a) >= $SubDupW)),
       |nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
       |       FROM w GROUP BY 1),
       |dw AS (SELECT wh FROM (
       |         SELECT wh, count(DISTINCT doc_id) AS ndocs FROM w GROUP BY 1)
       |       WHERE ndocs >= 2),
       |dup AS (SELECT w.doc_id, w.pos FROM w JOIN dw USING (wh)),
       |runs AS (
       |  SELECT doc_id,
       |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
       |  FROM dup),
       |mx AS (SELECT doc_id, CAST(MAX(rl) AS BIGINT) AS max_run FROM (
       |         SELECT doc_id, isl, count(*) AS rl FROM runs GROUP BY 1, 2)
       |       GROUP BY 1),
       |nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
       |       FROM dup GROUP BY 1)
       |SELECT nw.doc_id, n_windows, n_dup,
       |  CAST(max_run + $SubDupW - 1 AS BIGINT) AS max_dup_len
       |FROM nw JOIN nd USING (doc_id) JOIN mx USING (doc_id)""".stripMargin

  // --------------------------------------------------------- q144
  /** MinHash-LSH parameter planner: the collision-probability S-curve
    * `p = 1 − (1 − j^r)^b` over a (bands, rows, similarity) grid — the
    * table an engineer reads to pick q27/q28's banding before a 100 TB
    * run. Powers are spelled as explicit multiplication chains (the
    * same left-associated text parsed by BOTH engines), never libm
    * `pow`, so the doubles match bit-for-bit. */
  private val LshBandsGrid = Seq(2, 4, 8, 16)
  private val LshRowsGrid = Seq(2, 4, 8)
  private def powChain(base: String, n: Int): String =
    Seq.fill(n)(s"($base)").mkString(" * ")
  private def lshPlanExprs: (String, String) = {
    // `rpb` = rows per band ("rows" is reserved in both SQL dialects)
    val jr = LshRowsGrid.map(r =>
      s"WHEN rpb = $r THEN ${powChain("j", r)}").mkString(
      "CASE ", " ", " END")
    val p = LshBandsGrid.map(b =>
      s"WHEN bands = $b THEN 1 - ${powChain("miss", b)}").mkString(
      "CASE ", " ", " END")
    (jr, p)
  }
  private def q144(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grid = for { b <- LshBandsGrid; r <- LshRowsGrid; i <- 1 to 9 }
      yield (b, r, i)
    val (jrExpr, pExpr) = lshPlanExprs
    grid.toDF("bands", "rpb", "j10")
      .withColumn("j", col("j10") / lit(10.0))
      .withColumn("jr", expr(jrExpr))
      .withColumn("miss", lit(1.0) - col("jr"))
      .select(col("bands"), col("rpb"), col("j10"),
        round(expr(pExpr), 6).as("collision_p"))
  }
  private val q144Sql = {
    val (jrExpr, pExpr) = lshPlanExprs
    s"""WITH grid AS (
       |  SELECT CAST(b.b AS INT) AS bands, CAST(r.r AS INT) AS rpb,
       |    CAST(i.i AS INT) AS j10
       |  FROM (SELECT unnest(${LshBandsGrid.mkString("[", ", ", "]")}) AS b) b,
       |       (SELECT unnest(${LshRowsGrid.mkString("[", ", ", "]")}) AS r) r,
       |       (SELECT unnest(range(1, 10)) AS i) i),
       |j AS (SELECT bands, rpb, j10, j10 / 10.0 AS j FROM grid),
       |jr AS (SELECT bands, rpb, j10, ($jrExpr) AS jr FROM j),
       |m AS (SELECT bands, rpb, j10, 1.0 - jr AS miss FROM jr)
       |SELECT bands, rpb, j10, round($pExpr, 6) AS collision_p
       |FROM m""".stripMargin
  }

  // --------------------------------------------------------- q145
  /** Exact Hamming-≤3 SimHash neighbors
    * ([[Similarity.hammingNeighbors]]): q30's 16-bit codes, pigeonhole
    * nibble banding (complete for distance ≤ 3 — no recall loss),
    * `bit_count(xor)` verify, top-5 per probe doc. The oracle is the
    * brute-force probe×corpus Hamming rank over the same q30 code
    * fragment, so the gate proves the banding's completeness claim. */
  private val HamK = 5
  private val HamMax = 3
  private def q145(s: SparkSession, dir: String): DataFrame = {
    val base = Dedup.spread(
      Tables.documents(s, dir).select(col("doc_id"), col("text")))
    val codes = base.select(col("doc_id"),
      Dedup.simhash16Native(base, Dedup.words(col("text"))).as("code"))
    val probes = codes.filter(col("doc_id") < 5)
      .select(col("doc_id").as("q_id"), col("code").as("q_code0"))
    Similarity.hammingNeighbors(codes, "doc_id", "code",
      probes, "q_id", "q_code0", HamK, HamMax)
  }
  private val q145Sql = {
    s"""WITH sh AS ($q30Sql),
       |q AS (SELECT doc_id AS q_id, simhash AS qh FROM sh WHERE doc_id < 5),
       |cand AS (
       |  SELECT q_id, doc_id,
       |    CAST(bit_count(xor(qh, simhash)) AS BIGINT) AS hamming
       |  FROM q, sh WHERE doc_id <> q_id)
       |SELECT q_id, CAST(rn AS INT) AS rank, doc_id, hamming FROM (
       |  SELECT q_id, doc_id, hamming,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |                       ORDER BY hamming, doc_id) AS rn
       |  FROM cand WHERE hamming <= $HamMax)
       |WHERE rn <= $HamK""".stripMargin
  }

  // --------------------------------------------------------- q146
  /** Per-doc cross-entropy under an add-α smoothed corpus BIGRAM model
    * — the CCNet/KenLM-style fluency filter one order above q72's
    * unigram surprisal: histories and bigrams counted exactly over the
    * corpus, `lp = ln((c12 + α)/(c1 + α·V))` per position, per-doc sum
    * via the q72 position-ordered fold (collect sorted by pos, fold
    * left) so the float total is engine- and partition-independent.
    * α = 0.5 exactly (binary fraction). Docs need ≥ 2 tokens. */
  private val BgAlpha = 0.5
  private def q146(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), Dedup.words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
    val w = t.select(col("doc_id"),
      posexplode(col("ws")).as(Seq("pos", "w2")))
    val bi = w
      .withColumn("w1", lag(col("w2"), 1).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .filter(col("w1").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = w.agg(countDistinct(col("w2")).as("v"))
    val lp = bi.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("pos"),
        log((col("c12") + lit(BgAlpha)) /
          (col("c1") + lit(BgAlpha) * col("v"))).as("lpw"))
    lp.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("lpw")))).as("arr"),
        count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-aggregate(col("arr"), lit(0.0),
          (acc, x) => acc + x.getField("lpw")) /
          col("n_bigrams").cast("double"), 6).as("xent"))
  }
  private val q146Sql =
    s"""WITH t AS (SELECT doc_id, $WsSplit AS ws FROM documents
       |           WHERE len($WsSplit) >= 2),
       |w AS (SELECT doc_id, unnest(ws) AS w2,
       |        generate_subscripts(ws, 1) AS pos FROM t),
       |bi AS (SELECT doc_id, pos, w2,
       |         lag(w2, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
       |       FROM w QUALIFY w1 IS NOT NULL),
       |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2),
       |c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1),
       |vocab AS (SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v FROM w),
       |lp AS (SELECT doc_id, pos,
       |         ln((c12 + $BgAlpha) / (c1 + $BgAlpha * v)) AS lpw
       |       FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
       |       CROSS JOIN vocab),
       |agg AS (SELECT doc_id,
       |    list_reduce(list(lpw ORDER BY pos), (a, b) -> a + b) AS s,
       |    COUNT(*) AS n_bigrams
       |  FROM lp GROUP BY doc_id)
       |SELECT doc_id, n_bigrams,
       |  round(-s / n_bigrams::DOUBLE, 6) AS xent FROM agg""".stripMargin

  // --------------------------------------------------------- q147
  /** Per-source datasheet — the "datasheets for datasets" report card
    * every corpus release ships: doc/token masses, exact mean length,
    * language spread, and the exact-duplicate rate (docs whose full
    * text recurs anywhere in the corpus). All exact integers plus two
    * edge-rounded ratios; the dup flag is one hash doc-frequency join
    * (md5 computed in the scan, the q26 discipline). */
  private def q147(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
      col("lang"), md5(col("text")).as("h"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupHashes = d.groupBy(col("h")).agg(count(lit(1)).as("nh"))
      .filter(col("nh") >= 2).select(col("h"))
    val flagged = d.join(dupHashes, Seq("h"), "left_semi")
      .select(col("doc_id")).withColumn("isdup", lit(1L))
    d.join(flagged.select(col("doc_id"), col("isdup")), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("n_tokens"),
        round(sum(col("toks")).cast("double") / count(lit(1)), 6)
          .as("avg_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(coalesce(col("isdup"), lit(0L))).cast("long").as("n_dup_docs"))
      .withColumn("dup_frac",
        round(col("n_dup_docs").cast("double") / col("n_docs"), 6))
  }
  /** q147's oracle with the source relation and corpus membership
    * parameterized — shared with the maintained-datasheet gates
    * (CurationQueries q297–q299), which overlay deterministic
    * duplicate copies (`pre` carries their extra CTE, `src` names it)
    * and whose RTBF arm reports over the survivors. */
  private[queries] def q147SqlFrom(pre: String, src: String,
      where: String): String =
    s"""WITH ${pre}d AS (
       |  SELECT doc_id, source, lang, md5(text) AS h,
       |    CAST(len($WsSplit) AS BIGINT) AS toks
       |  FROM $src$where),
       |dh AS (SELECT h FROM (SELECT h, COUNT(*) AS nh FROM d GROUP BY 1)
       |       WHERE nh >= 2),
       |f AS (SELECT doc_id, CAST(1 AS BIGINT) AS isdup FROM d
       |      WHERE h IN (SELECT h FROM dh))
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
       |  round(CAST(SUM(toks) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6)
       |    AS avg_tokens,
       |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       |  CAST(SUM(COALESCE(isdup, 0)) AS BIGINT) AS n_dup_docs,
       |  round(CAST(SUM(COALESCE(isdup, 0)) AS BIGINT) /
       |        CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac
       |FROM d LEFT JOIN f USING (doc_id)
       |GROUP BY 1""".stripMargin
  private val q147Sql = q147SqlFrom("", "documents", "")

  // --------------------------------------------------------- q148
  /** Per-source Zipf slope: OLS fit of ln(freq) on ln(rank) over each
    * source's top-100 vocabulary — the corpus-health fingerprint
    * (natural prose ≈ −1; templated/boilerplate sources flatten or
    * steepen). Every ln term is rounded to a scaled long BEFORE
    * summing (the q104 discipline), so the four regression sums are
    * associative integer adds — identical on any partitioning — and
    * the slope is one fixed double expression over exact longs. */
  private val ZipfTopR = 100
  private val ZipfMinTerms = 10
  private def q148(s: SparkSession, dir: String): DataFrame = {
    val w = Tables.documents(s, dir)
      .select(col("source"), explode(Dedup.words(col("text"))).as("w"))
    val vocab = w.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("freq"))
    val win = Window.partitionBy(col("source"))
      .orderBy(col("freq").desc, col("w").asc)
    val ranked = vocab.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= ZipfTopR)
    val terms = ranked.select(col("source"),
      round(log(col("rank").cast("double")) * 1e6).cast("long").as("x"),
      round(log(col("freq").cast("double")) * 1e6).cast("long").as("y"),
      round(log(col("rank").cast("double")) *
        log(col("freq").cast("double")) * 1e12).cast("long").as("xy"),
      round(log(col("rank").cast("double")) *
        log(col("rank").cast("double")) * 1e12).cast("long").as("xx"))
    terms.groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("xy")).as("sxy"),
        sum(col("xx")).as("sxx"))
      .filter(col("n_terms") >= ZipfMinTerms)
      .select(col("source"), col("n_terms"),
        round(((col("n_terms") * col("sxy")) / lit(1e12) -
          (col("sx") / lit(1e6)) * (col("sy") / lit(1e6))) /
          ((col("n_terms") * col("sxx")) / lit(1e12) -
            (col("sx") / lit(1e6)) * (col("sx") / lit(1e6))), 6)
          .as("zipf_slope"))
  }
  private val q148Sql =
    s"""WITH w AS (SELECT source, unnest($WsSplit) AS w FROM documents),
       |vocab AS (SELECT source, w, CAST(count(*) AS BIGINT) AS freq
       |          FROM w GROUP BY 1, 2),
       |ranked AS (SELECT source, freq, rank FROM (
       |    SELECT source, freq,
       |      ROW_NUMBER() OVER (PARTITION BY source
       |                         ORDER BY freq DESC, w ASC) AS rank
       |    FROM vocab) WHERE rank <= $ZipfTopR),
       |terms AS (SELECT source,
       |    CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT) AS x,
       |    CAST(round(ln(CAST(freq AS DOUBLE)) * 1e6) AS BIGINT) AS y,
       |    CAST(round(ln(CAST(rank AS DOUBLE)) *
       |               ln(CAST(freq AS DOUBLE)) * 1e12) AS BIGINT) AS xy,
       |    CAST(round(ln(CAST(rank AS DOUBLE)) *
       |               ln(CAST(rank AS DOUBLE)) * 1e12) AS BIGINT) AS xx
       |  FROM ranked),
       |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(xy) AS BIGINT) AS sxy, CAST(SUM(xx) AS BIGINT) AS sxx
       |  FROM terms GROUP BY 1)
       |SELECT source, n_terms,
       |  round(((n_terms * sxy) / 1e12 - (sx / 1e6) * (sy / 1e6)) /
       |        ((n_terms * sxx) / 1e12 - (sx / 1e6) * (sx / 1e6)), 6)
       |    AS zipf_slope
       |FROM agg WHERE n_terms >= $ZipfMinTerms""".stripMargin

  // --------------------------------------------------------- q149
  /** Sparse lexical doc-similarity: TF-IDF cosine top-k neighbors of
    * probe docs via the inverted index — postings join on the term,
    * partial products summed per (probe, doc). Every tf-idf weight is
    * a scaled long (`round(tf·ln(N/df)·10⁶)`), so dots and norms² are
    * EXACT integer sums (associative — partitioning-independent) and
    * the cosine is one double expression over exact longs. The sparse
    * sibling of q31's dense embedding cosine; at 100 TB the weights
    * would move to DECIMAL(38,0) (the q120 note). */
  private val TfidfSimK = 5
  private def q149(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val w = docs.select(col("doc_id"), explode(Dedup.words(col("text"))).as("w"))
    val tf = w.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val post = tf.join(dfreq, Seq("w")).crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("w"),
        round(col("tf") * log(col("n").cast("double") / col("df")) * 1e6)
          .cast("long").as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = post.groupBy(col("doc_id"))
      .agg(sum(col("s") * col("s")).as("n2"))
    val probes = post.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"), col("w"), col("s").as("qs"))
    val dots = post.join(broadcast(probes), Seq("w"))
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("qs") * col("s")).as("dot"))
    val win = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("doc_id").asc)
    dots.join(norms, Seq("doc_id"))
      .join(norms.select(col("doc_id").as("q_id"), col("n2").as("qn2")),
        Seq("q_id"))
      .select(col("q_id"), col("doc_id"),
        round(col("dot") / (sqrt(col("n2")) * sqrt(col("qn2"))), 6)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= TfidfSimK)
      .select(col("q_id"), col("rank").cast("int").as("rank"),
        col("doc_id"), col("cos_sim"))
  }
  private val q149Sql =
    s"""WITH w AS (SELECT doc_id, unnest($WsSplit) AS w FROM documents),
       |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
       |       FROM w GROUP BY 1, 2),
       |dfreq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |post AS (SELECT doc_id, w,
       |    CAST(round(tf * ln(CAST(n AS DOUBLE) / df) * 1e6) AS BIGINT) AS s
       |  FROM tf JOIN dfreq USING (w) CROSS JOIN n),
       |norms AS (SELECT doc_id, CAST(SUM(s * s) AS BIGINT) AS n2
       |          FROM post GROUP BY 1),
       |probes AS (SELECT doc_id AS q_id, w, s AS qs FROM post WHERE doc_id < 3),
       |dots AS (SELECT q_id, doc_id, CAST(SUM(qs * s) AS BIGINT) AS dot
       |  FROM post JOIN probes USING (w) WHERE doc_id <> q_id
       |  GROUP BY 1, 2),
       |cosv AS (SELECT q_id, dots.doc_id,
       |    round(dot / (sqrt(n2) * sqrt(qn2)), 6) AS cos_sim
       |  FROM dots JOIN norms ON dots.doc_id = norms.doc_id
       |  JOIN (SELECT doc_id AS q_id, n2 AS qn2 FROM norms) qn USING (q_id))
       |SELECT q_id, CAST(rn AS INT) AS rank, doc_id, cos_sim FROM (
       |  SELECT q_id, doc_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |                       ORDER BY cos_sim DESC, doc_id ASC) AS rn
       |  FROM cosv) WHERE rn <= $TfidfSimK""".stripMargin

  // --------------------------------------------------------- q150
  /** DSIR importance log-weights (Xie et al. 2023, "Data Selection via
    * Importance Resampling"): score every document by how much more
    * likely its bigrams are under a TARGET domain's bigram LM than
    * under the rest-of-corpus model — the per-doc importance weight a
    * domain-targeted sampler resamples by. Target = source 'src0';
    * both LMs are add-1 smoothed over the SHARED bigram vocabulary,
    * counted exactly; per-position log-ratio, per-doc mean via the
    * q72/q146 position-ordered fold so the float total is engine- and
    * partition-independent.
    *
    * Scale shape: one gram-keyed count aggregation (vocabulary-sized,
    * never collected), a 1-row totals broadcast, one gram-keyed join
    * back to the doc stream, one doc-keyed fold. At 100 TB the gram
    * key hashes to 64 bits first (the q105 discipline). */
  private val DsirTarget = "src0"
  /** The (doc_id, tgt, pos, g) bigram stream q150 counts and scores —
    * shared with the incremental scorer (CurationQueries q277), whose
    * maintained LM store absorbs exactly these rows. */
  private[queries] def dsirBigrams(docs: DataFrame): DataFrame = {
    val t = docs
      .select(col("doc_id"), (col("source") === DsirTarget).as("tgt"),
        Dedup.words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
    t.select(col("doc_id"), col("tgt"),
        posexplode(col("ws")).as(Seq("pos", "w2")))
      .withColumn("w1", lag(col("w2"), 1).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .filter(col("w1").isNotNull)
      .select(col("doc_id"), col("tgt"), col("pos"),
        concat_ws(" ", col("w1"), col("w2")).as("g"))
  }
  /** The DSIR scoring tail — per-position add-1 log-ratio, per-doc
    * position-ordered fold — over ANY (g, ct, cr) LM source and
    * (nt, nr, v) totals row, so the from-scratch path (q150) and the
    * maintained-store path (q277) share the formula by construction
    * (bit-identical doubles). */
  private[queries] def dsirScore(bi: DataFrame, counts: DataFrame,
      tot: DataFrame): DataFrame = {
    val lp = bi.join(counts, Seq("g")).crossJoin(broadcast(tot))
      .select(col("doc_id"), col("pos"),
        (log((col("ct") + lit(1L)).cast("double") /
            (col("nt") + col("v")).cast("double")) -
          log((col("cr") + lit(1L)).cast("double") /
            (col("nr") + col("v")).cast("double"))).as("lr"))
    lp.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("lr")))).as("arr"),
        count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        round(aggregate(col("arr"), lit(0.0),
          (acc, x) => acc + x.getField("lr")) /
          col("n_bigrams").cast("double"), 6).as("dsir_logweight"))
  }
  private def q150(s: SparkSession, dir: String): DataFrame = {
    val bi = dsirBigrams(Tables.documents(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = bi.groupBy(col("g")).agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("tgt"), 1L).otherwise(0L)).as("cr"))
    val tot = counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"),
      count(lit(1)).as("v"))
    dsirScore(bi, counts, tot)
  }
  /** q150's CTE chain with injectable restrictions: `where` narrows
    * the SCORED docs (LM counts/totals stay corpus-wide — the q277
    * delta-batch shape), `corpusAnd` narrows the CORPUS itself (the
    * q278 right-to-be-forgotten shape: forgotten docs leave the LMs
    * too). `("", "")` is q150's own oracle. */
  private[queries] def q150SqlScored(where: String,
      corpusAnd: String = ""): String =
    s"""WITH t AS (SELECT doc_id, source = '$DsirTarget' AS tgt,
       |             $WsSplit AS ws FROM documents
       |           WHERE len($WsSplit) >= 2$corpusAnd),
       |w AS (SELECT doc_id, tgt, unnest(ws) AS w2,
       |        generate_subscripts(ws, 1) AS pos FROM t),
       |bi AS (SELECT doc_id, tgt, pos, w1 || ' ' || w2 AS g FROM (
       |         SELECT doc_id, tgt, pos, w2,
       |           lag(w2, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
       |         FROM w QUALIFY w1 IS NOT NULL)),
       |counts AS (SELECT g,
       |    CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |    CAST(SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS BIGINT) AS cr
       |  FROM bi GROUP BY 1),
       |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
       |    CAST(SUM(cr) AS BIGINT) AS nr,
       |    CAST(COUNT(*) AS BIGINT) AS v FROM counts),
       |lp AS (SELECT doc_id, pos,
       |    ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + v AS DOUBLE)) -
       |      ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + v AS DOUBLE)) AS lr
       |  FROM bi JOIN counts USING (g) CROSS JOIN tot),
       |agg AS (SELECT doc_id,
       |    list_reduce(list(lr ORDER BY pos), (a, b) -> a + b) AS sm,
       |    CAST(COUNT(*) AS BIGINT) AS n_bigrams
       |  FROM lp GROUP BY doc_id)
       |SELECT doc_id, n_bigrams,
       |  round(sm / n_bigrams::DOUBLE, 6) AS dsir_logweight
       |FROM agg$where""".stripMargin
  private val q150Sql = q150SqlScored("")

  // --------------------------------------------------------- q151
  /** α-temperature sampling shares (the XLM-R / mT5 multilingual
    * discipline): flatten the language distribution by exponentiating
    * natural shares, q_l ∝ p_l^α — the standard low-resource
    * upweighting, vs q115's budget-constrained mixture table. α = 1/4
    * exactly, so p^α = sqrt(sqrt(p)) — two correctly-rounded IEEE
    * sqrts, bit-identical cross-engine where pow would not be. The
    * share normalizer sums 1e12-scaled LONGS (the q130 discipline), so
    * no float-summation order can flicker the output. Shape: one
    * groupBy bounded by |languages| + two 1-row broadcasts. */
  private def q151(s: SparkSession, dir: String): DataFrame = {
    // the |languages|-row counts frame feeds tot, the z normalizer AND
    // the final projection — persist it, or each consumer re-runs the
    // full documents scan (~4 corpus reads for a 5-row table)
    val counts = Tables.documents(s, dir).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = counts.agg(sum(col("n_docs")).as("n"))
    val scored = counts.crossJoin(broadcast(tot))
      .withColumn("p", col("n_docs").cast("double") / col("n"))
      .withColumn("pi",
        round(sqrt(sqrt(col("p"))) * lit(1e12), 0).cast("long"))
    val z = scored.agg(sum(col("pi")).as("z"))
    scored.crossJoin(broadcast(z))
      .select(col("lang"), col("n_docs"),
        round(col("p"), 6).as("nat_share"),
        round(col("pi").cast("double") / col("z"), 6).as("samp_share"))
  }
  /** q151's CTE chain with an injectable corpus restriction — `""`
    * is q151's own oracle; the RTBF gate (CurationQueries q275)
    * narrows to the surviving documents. */
  private[queries] def q151SqlWhere(where: String): String =
    s"""WITH counts AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      |                FROM documents$where GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM counts),
      |scored AS (SELECT lang, n_docs,
      |    n_docs::DOUBLE / n AS p,
      |    CAST(round(sqrt(sqrt(n_docs::DOUBLE / n)) * 1e12) AS BIGINT) AS pi
      |  FROM counts CROSS JOIN tot),
      |z AS (SELECT CAST(SUM(pi) AS BIGINT) AS z FROM scored)
      |SELECT lang, n_docs, round(p, 6) AS nat_share,
      |  round(pi::DOUBLE / z, 6) AS samp_share
      |FROM scored CROSS JOIN z""".stripMargin
  private[queries] val q151Sql = q151SqlWhere("")

  // --------------------------------------------------------- q152
  /** Sentence-level exact cross-doc duplication report (the RefinedWeb
    * / CCNet line-dedup pass, sentence edition — this corpus has no
    * newlines): normalized sentences keyed across the corpus, a
    * sentence occurrence counts as duplicated when its key appears in
    * ≥ 2 DISTINCT documents, rolled up per source — the
    * boilerplate-contamination figure a curation report ships per
    * provenance. Shape: two sentence-keyed shuffles (group + join
    * back), one source-keyed rollup; the shuffle key is xxhash64 of
    * the sentence (q105 discipline) — only 8 bytes cross the wire
    * per row instead of the full sentence text, and nothing
    * downstream needs the text itself. */
  private val SentMinChars = 20
  private def q152(s: SparkSession, dir: String): DataFrame = {
    val sent = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        explode(TextAnalysis.words(col("text"), ". ")).as("s0"))
      .select(col("doc_id"), col("source"), lower(trim(col("s0"))).as("k"))
      .filter(length(col("k")) >= SentMinChars)
      .select(col("doc_id"), col("source"), xxhash64(col("k")).as("hk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val groups = sent.groupBy(col("hk"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    sent.join(groups, Seq("hk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sentences"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_cross_dup"))
      .select(col("source"), col("n_sentences"), col("n_cross_dup"),
        round(col("n_cross_dup").cast("double") / col("n_sentences"), 6)
          .as("dup_frac"))
  }
  private val q152Sql =
    s"""WITH sent AS (
       |  SELECT doc_id, source, lower(trim(s0)) AS k
       |  FROM (SELECT doc_id, source,
       |          unnest(string_split(text, '. ')) AS s0 FROM documents)
       |  WHERE len(lower(trim(s0))) >= $SentMinChars),
       |groups AS (SELECT k, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
       |           FROM sent GROUP BY 1)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sentences,
       |  CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_cross_dup,
       |  round(CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac
       |FROM sent JOIN groups USING (k) GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q153
  /** Tokenizer fertility per language — BPE-ish subword tokens per
    * whitespace word, the standard multilingual tokenizer-efficiency
    * diagnostic (a high-fertility language pays more sequence length
    * per word, which q115/q151-style mixers must budget for). Exact
    * integer token counts per row ride the scan projection; one
    * lang-keyed partial-aggregated groupBy; a single division at the
    * end. */
  private def q153(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"),
        TextAnalysis.tokenCountRegex(col("text")).cast("long").as("bpe"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("wsc"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("bpe")).as("n_bpe_tokens"),
        sum(col("wsc")).as("n_ws_tokens"))
      .select(col("lang"), col("n_docs"), col("n_bpe_tokens"),
        col("n_ws_tokens"),
        round(col("n_bpe_tokens").cast("double") / col("n_ws_tokens"), 6)
          .as("fertility"))
  private val q153Sql =
    s"""WITH t AS (SELECT lang,
       |    CAST(len(regexp_extract_all(text, '${TextAnalysis.BpeTokenPattern}')) AS BIGINT) AS bpe,
       |    CAST(len($WsSplit) AS BIGINT) AS wsc
       |  FROM documents)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
       |  CAST(SUM(wsc) AS BIGINT) AS n_ws_tokens,
       |  round(CAST(SUM(bpe) AS BIGINT)
       |    / CAST(CAST(SUM(wsc) AS BIGINT) AS DOUBLE), 6) AS fertility
       |FROM t GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q154
  /** Calibration (reliability-diagram) bins for the q135 linear
    * classifier: confidence = softmax max-probability, binned by
    * tenths, vs agreement with the (range-folded) label — the
    * quality-classifier calibration audit a filtering pipeline runs
    * before trusting scores as sampling weights. The softmax is the
    * max-subtracted 4-term sum in a FIXED left-to-right order
    * (identical tree both engines); per-bin mean confidence sums
    * 1e9-scaled longs (q130 discipline) so no float-summation order
    * leaks in. Zero-shuffle scoring on the scan + one bin-keyed
    * aggregation bounded by 10 rows. */
  private def q154(s: SparkSession, dir: String): DataFrame = {
    val scoreCols = Similarity.linearScores(col("embedding"),
      ClfWeights, ClfBias)
    val scored = Tables.embeddings(s, dir).select(
      col("vec_id") +: col("label") +:
        scoreCols.zipWithIndex.map { case (c, i) => c.as(s"s$i") }: _*)
    val best = Similarity.argmaxStruct(
      (0 until ClfClasses).map(i => col(s"s$i")))
    val smax = greatest((0 until ClfClasses).map(i => col(s"s$i")): _*)
    val denom = (0 until ClfClasses)
      .map(i => exp(col(s"s$i") - col("smax"))).reduce(_ + _)
    scored
      .withColumn("smax", smax)
      .withColumn("prob", lit(1.0) / denom)
      .select(
        least(floor(col("prob") * 10), lit(9L)).cast("int").as("bin"),
        (best.getField("c").cast("int") === col("label") % 4)
          .cast("long").as("hit"),
        round(col("prob") * lit(1e9), 0).cast("long").as("pi"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("hit")).as("n_correct"),
        sum(col("pi")).as("spi"))
      .select(col("bin"), col("n"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n"), 6).as("accuracy"),
        round(col("spi").cast("double") / col("n") / lit(1e9), 6)
          .as("avg_conf"))
  }
  private val q154Sql = {
    def wlist(c: Int) = ClfWeights(c).mkString("[", ", ", "]")
    val sCols = (0 until ClfClasses).map(c =>
      s"list_dot_product(v, ${wlist(c)}) + ${ClfBias(c)} AS s$c")
      .mkString(",\n|    ")
    s"""WITH v AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (SELECT vec_id, label,
       |    $sCols
       |  FROM v),
       |m AS (SELECT vec_id, label, s0, s1, s2, s3,
       |    greatest(s0, s1, s2, s3) AS smax FROM s),
       |p AS (SELECT vec_id, label,
       |    CAST(CASE WHEN s3 > greatest(s0, s1, s2) THEN 3
       |              WHEN s2 > greatest(s0, s1) THEN 2
       |              WHEN s1 > s0 THEN 1 ELSE 0 END AS INT) AS pred,
       |    1.0 / (exp(s0 - smax) + exp(s1 - smax) + exp(s2 - smax)
       |           + exp(s3 - smax)) AS prob
       |  FROM m),
       |b AS (SELECT
       |    CAST(least(floor(prob * 10), 9) AS INT) AS bin,
       |    CASE WHEN pred = label % 4 THEN 1 ELSE 0 END AS hit,
       |    CAST(round(prob * 1e9) AS BIGINT) AS pi
       |  FROM p)
       |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(hit) AS BIGINT) AS n_correct,
       |  round(CAST(SUM(hit) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6)
       |    AS accuracy,
       |  round(CAST(SUM(pi) AS BIGINT)::DOUBLE / COUNT(*) / 1e9, 6)
       |    AS avg_conf
       |FROM b GROUP BY 1""".stripMargin
  }

  // --------------------------------------------------------- q156
  /** Gopher rule-by-rule quality report (Rae et al. 2021, §A1.1
    * adapted to this corpus): per source, how many documents fail each
    * of five structural rules — word count outside [50, 100k], mean
    * word length outside [3, 10], >10% of words starting with a
    * non-alphanumeric mark (the q34 punct definition), fewer than 2
    * distinct function words (union of the per-language stopword
    * lists), and <80% of words containing an ASCII letter (an
    * en-centric rule kept as published; zh documents fail it by
    * construction, which is exactly what the per-source report is for
    * — it shows WHERE a rule misfires). All five flags are per-row
    * array math on the scan (zero shuffle); one source-keyed rollup.
    * Complements q34 (a composite score) and q75 (mass report): this
    * is the per-rule diagnostic a filter-tuning pass reads. */
  /** The five Gopher rule FAIL flags as (name, 0/1 column) — shared by
    * q156 (per-rule report) and q159 (funnel stage 1). */
  private def gopherFailCols: Seq[(String, org.apache.spark.sql.Column)] = {
    val allStops = TextAnalysis.StopwordSets.flatMap(_._2).distinct.sorted
    val ws = Dedup.words(col("text"))
    val nw = size(ws)
    val sumLen = aggregate(transform(ws, w => length(w).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val meanLen = sumLen.cast("double") / nw.cast("double")
    val punct = size(filter(ws,
      w => !substring(w, 1, 1).rlike("[A-Za-z0-9]"))).cast("double") /
      nw.cast("double")
    val nStops = size(array_intersect(ws,
      array(allStops.map(lit): _*)))
    val alphaFrac = size(filter(ws, w => w.rlike("[A-Za-z]")))
      .cast("double") / nw.cast("double")
    Seq(
      "f_nwords" -> (nw < 50 || nw > 100000).cast("long"),
      "f_wordlen" -> (meanLen < 3.0 || meanLen > 10.0).cast("long"),
      "f_punct" -> (punct > 0.1).cast("long"),
      "f_stopword" -> (nStops < 2).cast("long"),
      "f_alpha" -> (alphaFrac < 0.8).cast("long"))
  }
  /** DuckDB mirrors of [[gopherFailCols]], same names and order. */
  private def gopherFailSql: Seq[(String, String)] = {
    val stopList = TextAnalysis.StopwordSets.flatMap(_._2).distinct.sorted
      .map(w => s"'$w'").mkString("[", ", ", "]")
    Seq(
      "f_nwords" -> s"""CASE WHEN len($WsSplit) < 50 OR len($WsSplit) > 100000
         THEN 1 ELSE 0 END""",
      "f_wordlen" -> s"""CASE WHEN list_sum(list_transform($WsSplit, w -> len(w)))
             / CAST(len($WsSplit) AS DOUBLE) < 3.0
           OR list_sum(list_transform($WsSplit, w -> len(w)))
             / CAST(len($WsSplit) AS DOUBLE) > 10.0
         THEN 1 ELSE 0 END""",
      "f_punct" -> s"""CASE WHEN len(list_filter($WsSplit, w ->
             NOT regexp_matches(substr(w, 1, 1), '[A-Za-z0-9]')))
             / CAST(len($WsSplit) AS DOUBLE) > 0.1
         THEN 1 ELSE 0 END""",
      "f_stopword" -> s"""CASE WHEN len(list_intersect($WsSplit, $stopList)) < 2
         THEN 1 ELSE 0 END""",
      "f_alpha" -> s"""CASE WHEN len(list_filter($WsSplit, w ->
             regexp_matches(w, '[A-Za-z]')))
             / CAST(len($WsSplit) AS DOUBLE) < 0.8
         THEN 1 ELSE 0 END""")
  }
  private def q156(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("source") +:
        gopherFailCols.map { case (n, c) => c.as(n) }: _*)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("f_nwords")).as("n_fail_nwords"),
        sum(col("f_wordlen")).as("n_fail_wordlen"),
        sum(col("f_punct")).as("n_fail_punct"),
        sum(col("f_stopword")).as("n_fail_stopword"),
        sum(col("f_alpha")).as("n_fail_alpha"),
        sum(when(col("f_nwords") + col("f_wordlen") + col("f_punct") +
          col("f_stopword") + col("f_alpha") === 0, 1L).otherwise(0L))
          .as("n_pass_all"))
  }
  private val q156Sql = {
    val flagCols = gopherFailSql
      .map { case (n, sql) => s"$sql AS $n" }.mkString(",\n|    ")
    s"""WITH f AS (SELECT source,
       |    $flagCols
       |  FROM documents)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(f_nwords) AS BIGINT) AS n_fail_nwords,
       |  CAST(SUM(f_wordlen) AS BIGINT) AS n_fail_wordlen,
       |  CAST(SUM(f_punct) AS BIGINT) AS n_fail_punct,
       |  CAST(SUM(f_stopword) AS BIGINT) AS n_fail_stopword,
       |  CAST(SUM(f_alpha) AS BIGINT) AS n_fail_alpha,
       |  CAST(SUM(CASE WHEN f_nwords + f_wordlen + f_punct + f_stopword
       |                     + f_alpha = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_pass_all
       |FROM f GROUP BY 1""".stripMargin
  }

  // --------------------------------------------------------- q158
  /** Vocabulary coverage curve: the fraction of total token mass
    * covered by the top-k most frequent tokens, k ∈ {100, 1000,
    * 10000} — the diagnostic a tokenizer-vocab design reads (how much
    * of the corpus does a k-entry vocabulary already explain?). Global
    * frequency rank comes from [[Layout.globalRank]] — the two-pass
    * range-exchange rank, NOT a single-task global window — and the
    * coverage sums are exact BIGINT conditional sums over the ranked
    * vocab; one final 1-row division per k. */
  private val CoverageKs = Seq(100, 1000, 10000)
  private def q158(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vocab = Tables.documents(s, dir)
      .select(explode(Dedup.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val ranked = Layout.globalRank(vocab, col("freq").desc, col("w").asc)
    val aggCols = count(lit(1)).as("n_vocab") +:
      sum(col("freq")).as("total") +:
      CoverageKs.map(k =>
        sum(when(col("rank") <= k, col("freq")).otherwise(0L)).as(s"m$k"))
    val sums = ranked.agg(aggCols.head, aggCols.tail: _*)
    val ks = CoverageKs.map(_.toLong).toDF("k")
    ks.crossJoin(broadcast(sums))
      .select(col("k"), col("n_vocab"), col("total").as("total_tokens"),
        round(CoverageKs.foldRight(lit(0.0)) { (kk, acc) =>
          when(col("k") === kk, col(s"m$kk").cast("double") / col("total"))
            .otherwise(acc)
        }, 6).as("coverage"))
  }
  private val q158Sql = {
    val mCols = CoverageKs.map(k =>
      s"CAST(SUM(CASE WHEN rank <= $k THEN freq ELSE 0 END) AS BIGINT) AS m$k")
      .mkString(",\n|    ")
    val kRows = CoverageKs.map(k => s"(${k}::BIGINT)").mkString(", ")
    val cover = CoverageKs.map(k =>
      s"WHEN k = $k THEN m$k / CAST(total AS DOUBLE)")
      .mkString("CASE ", " ", " ELSE 0.0 END")
    s"""WITH vocab AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($WsSplit) AS w FROM documents) GROUP BY 1),
       |ranked AS (SELECT freq,
       |    ROW_NUMBER() OVER (ORDER BY freq DESC, w ASC) AS rank
       |  FROM vocab),
       |sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
       |    CAST(SUM(freq) AS BIGINT) AS total,
       |    $mCols
       |  FROM ranked),
       |ks(k) AS (VALUES $kRows)
       |SELECT k, n_vocab, total AS total_tokens,
       |  round($cover, 6) AS coverage
       |FROM ks CROSS JOIN sums""".stripMargin
  }

  // --------------------------------------------------------- q159
  /** Filter funnel — the stage-by-stage survival report every curation
    * run publishes before committing a policy: per source, how many
    * documents survive (1) the Gopher structural rules, (2) AND
    * exact-dup first-occurrence keep (md5 canonical, min doc_id wins
    * AMONG STAGE-1 SURVIVORS — deduping against already-discarded
    * copies would silently drop a text entirely when its lowest-id
    * copy failed a rule), (3) AND a quality-score floor. Stages are
    * CUMULATIVE — the waterfall a policy owner reads to see which
    * stage costs which source. Flags are scan-side row math; the
    * dedup stage is one hash-keyed aggregation + keyed join; one
    * source rollup. */
  private val FunnelQualityFloor = 0.5
  private def q159(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        (gopherFailCols.map(_._2).reduce(_ + _) === 0).as("gopher_ok"),
        md5(col("text")).as("ck"),
        (TextAnalysis.qualityScore(col("text"), col("n_chars"))
          >= FunnelQualityFloor).as("quality_ok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val firsts = docs.filter(col("gopher_ok"))
      .groupBy(col("ck")).agg(min(col("doc_id")).as("keep_id"))
    docs.join(firsts, Seq("ck"), "left_outer")
      .select(col("source"), col("gopher_ok"),
        (col("doc_id") === col("keep_id")).as("first_ok"), col("quality_ok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("gopher_ok"), 1L).otherwise(0L)).as("n_after_gopher"),
        sum(when(col("gopher_ok") && col("first_ok"), 1L).otherwise(0L))
          .as("n_after_dedup"),
        sum(when(col("gopher_ok") && col("first_ok") && col("quality_ok"),
          1L).otherwise(0L)).as("n_after_quality"))
  }
  private val q159Sql = {
    val failSum = gopherFailSql.map(_._2).mkString("(", " + ", ")")
    s"""WITH d AS (SELECT doc_id, source,
       |    $failSum = 0 AS gopher_ok,
       |    md5(text) AS ck,
       |    round((len_band + word_band + (1.0 - least(punct * 4, 1.0))) / 3.0, 4)
       |      >= $FunnelQualityFloor AS quality_ok
       |  FROM (
       |    SELECT doc_id, source, text,
       |      len(list_filter(list_transform($WsSplit, w -> substr(w, 1, 1)),
       |          c -> NOT regexp_matches(c, '[A-Za-z0-9]')))::DOUBLE
       |        / greatest(len($WsSplit), 1) AS punct,
       |      CASE WHEN n_chars BETWEEN 100 AND 400 THEN 1.0
       |           WHEN n_chars BETWEEN 50 AND 99 OR n_chars BETWEEN 401 AND 600 THEN 0.5
       |           ELSE 0.0 END AS len_band,
       |      CASE WHEN n_chars::DOUBLE / greatest(len($WsSplit), 1) BETWEEN 3.0 AND 8.0
       |           THEN 1.0 ELSE 0.5 END AS word_band
       |    FROM documents)),
       |firsts AS (SELECT ck, MIN(doc_id) AS keep_id FROM d
       |           WHERE gopher_ok GROUP BY 1)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN gopher_ok THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_after_gopher,
       |  CAST(SUM(CASE WHEN gopher_ok AND doc_id = keep_id
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_after_dedup,
       |  CAST(SUM(CASE WHEN gopher_ok AND doc_id = keep_id AND quality_ok
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_after_quality
       |FROM d LEFT JOIN firsts USING (ck) GROUP BY 1""".stripMargin
  }

  // --------------------------------------------------------- q160
  /** Shard-skew report: split the corpus into 32 md5-hash shards (the
    * q57 deterministic bucketing at export fan-out width) and report
    * the token-mass balance — min/max shard mass and the max/mean skew
    * ratio. The health check a shard-layout owner reads before a
    * training run: skew ≈ 1 means every writer finishes together. One
    * scan-side bucket projection, one 32-key aggregation, one 1-row
    * rollup; skew is one double division over exact integer masses. */
  private val SkewShards = 32
  private def q160(s: SparkSession, dir: String): DataFrame = {
    val bucket = conv(substring(md5(col("text")), 1, 6), 16, 10)
      .cast("long") % SkewShards
    val shards = Tables.documents(s, dir)
      .select(bucket.as("shard"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("toks"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
    shards.agg(count(lit(1)).as("n_shards"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("total_tokens"))
      .select(col("n_shards"), col("min_tokens"), col("max_tokens"),
        col("total_tokens"),
        round((col("max_tokens") * col("n_shards")).cast("double") /
          col("total_tokens"), 6).as("skew"))
  }
  private val q160Sql =
    s"""WITH shards AS (
       |  SELECT ('0x' || substr(md5(text), 1, 6))::BIGINT % $SkewShards AS shard,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len($WsSplit)) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
       |  CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       |  CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  round(CAST(MAX(n_tokens) * COUNT(*) AS DOUBLE)
       |    / CAST(SUM(n_tokens) AS BIGINT), 6) AS skew
       |FROM shards""".stripMargin

  // --------------------------------------------------------- q161
  /** Near-dup cluster size histogram: the q50 transitive clusters
    * rolled up to (cluster size → number of clusters) — the one-table
    * summary that says whether near-duplication is pairwise noise
    * (all size 2) or template farms (fat clusters), and the sanity
    * gauge for LSH parameter choices (q144). Adds two tiny keyed
    * aggregations on top of the q50 component labels. */
  private def q161(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bands = Dedup
      .bandKeys(docs, "text", "doc_id", Bands, RowsPerBand, ShingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup
      .jaccardVerify(Dedup.candidatePairs(bands), docs, "text", "doc_id",
        JaccardThreshold)
      .select(col("id_a"), col("id_b"))
    Dedup.connectedComponents(pairs)
      .groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
  }
  private val q161Sql =
    s"""WITH RECURSIVE $BandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct($WsSplit) AS toks FROM documents),
       |vpairs AS (
       |  SELECT id_a, id_b
       |  FROM pairs JOIN sets sa ON id_a = sa.doc_id JOIN sets sb ON id_b = sb.doc_id
       |  WHERE len(list_intersect(sa.toks, sb.toks))::DOUBLE /
       |        len(list_distinct(list_concat(sa.toks, sb.toks))) >= $JaccardThreshold),
       |edges AS (SELECT id_a AS s, id_b AS d FROM vpairs
       |          UNION ALL SELECT id_b, id_a FROM vpairs),
       |reach AS (SELECT DISTINCT s AS node, s AS r FROM edges
       |          UNION
       |          SELECT e.s, r.r FROM edges e JOIN reach r ON r.node = e.d),
       |labels AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
       |sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |          FROM labels GROUP BY 1)
       |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
       |FROM sizes GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q162
  /** Language-id confusion matrix: the q33 stopword-argmax predictor
    * cross-tabulated against the labeled lang column — the audit that
    * says WHERE the cheap classifier misfires (and the q154 pattern
    * applied to the lexical side of the house). One scan-side
    * prediction + one (label, pred)-keyed aggregation bounded by
    * |langs|² + 1 rows. */
  private def q162(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), TextAnalysis.langId(col("text")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
  private val q162Sql = {
    val scoreCols = TextAnalysis.StopwordSets.map { case (lang, sw) =>
      val swList = sw.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter($WsSplit, w -> list_contains($swList, w)))::DOUBLE / greatest(len($WsSplit), 1) AS s_$lang"
    }
    val langsDesc = TextAnalysis.StopwordSets.map(_._1).sorted.reverse
    val best = s"greatest(${TextAnalysis.StopwordSets.map(l => s"s_${l._1}").mkString(", ")})"
    val pick = langsDesc.init
      .map(l => s"WHEN s_$l = $best THEN '$l'")
      .mkString(" ")
    s"""WITH p AS (SELECT lang,
       |    CASE WHEN $best = 0 THEN 'und' $pick ELSE '${langsDesc.last}' END AS lang_pred
       |  FROM (SELECT lang, ${scoreCols.mkString(", ")} FROM documents))
       |SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM p GROUP BY 1, 2""".stripMargin
  }

  // --------------------------------------------------------- q165
  /** Leading principal direction of the embedding Gram matrix by
    * distributed power iteration ([[Similarity.powerIterationPC1]],
    * 2 rounds, uniform 1/√64 init — exactly 0.125, a binary
    * fraction): the PCA primitive a whitening / dim-reduction pass
    * runs at corpus scale with nothing but a 64-vector on the
    * driver. The oracle unrolls both rounds CTE-by-CTE (the q137
    * discipline): per-row dot, 1e6-scaled-long per-dimension sums,
    * BigInt/HUGEINT norm, one double division. */
  private val PowerIters = 2
  private def q165(s: SparkSession, dir: String): DataFrame =
    Similarity.powerIterationPC1(Tables.embeddings(s, dir), "embedding",
      ClfDims, PowerIters)
  private val q165Sql = {
    val v0 = Seq.fill(ClfDims)("0.125").mkString("[", ", ", "]")
    s"""WITH x AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
       |s1 AS (SELECT v, list_dot_product(v, $v0) AS s FROM x),
       |c1 AS (SELECT p, CAST(round(v[p + 1] * s * 1e6) AS BIGINT) AS c
       |       FROM s1, generate_series(0, ${ClfDims - 1}) AS g(p)),
       |t1 AS (SELECT p, CAST(SUM(c) AS BIGINT) AS t FROM c1 GROUP BY 1),
       |n1 AS (SELECT sqrt(CAST(SUM(CAST(t AS HUGEINT) * t) AS DOUBLE)) AS nrm
       |       FROM t1),
       |v1 AS (SELECT p, CAST(t AS DOUBLE) / nrm AS vj
       |       FROM t1 CROSS JOIN n1),
       |v1l AS (SELECT list(vj ORDER BY p) AS vl FROM v1),
       |s2 AS (SELECT x.v, list_dot_product(x.v, v1l.vl) AS s
       |       FROM x CROSS JOIN v1l),
       |c2 AS (SELECT p, CAST(round(v[p + 1] * s * 1e6) AS BIGINT) AS c
       |       FROM s2, generate_series(0, ${ClfDims - 1}) AS g(p)),
       |t2 AS (SELECT p, CAST(SUM(c) AS BIGINT) AS t FROM c2 GROUP BY 1),
       |n2 AS (SELECT sqrt(CAST(SUM(CAST(t AS HUGEINT) * t) AS DOUBLE)) AS nrm
       |       FROM t2)
       |SELECT CAST(p AS INT) AS pos,
       |  round(CAST(t AS DOUBLE) / nrm, 6) AS loading
       |FROM t2 CROSS JOIN n2""".stripMargin
  }

  // --------------------------------------------------------- q166
  /** Johnson–Lindenstrauss sign projection: embeddings down-projected
    * 64 → 8 dims through a SEED-FREE ±1/√8 sign matrix (sign of the
    * first md5 byte of "jl_k_j" — any engine rebuilds the identical
    * matrix from the names alone, the q57/q63 md5 discipline). The
    * cheap-ANN front end: distances are preserved in expectation, the
    * projection is pure scan-side codegen (8 unrolled literal dots,
    * zero shuffle, the q135 shape), and the matrix ships as 512
    * literals — no driver state at all. */
  private val JlOutDims = 8
  private val JlSigns: Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val scale = 1.0 / math.sqrt(JlOutDims.toDouble)
    (0 until JlOutDims).map(k => (0 until ClfDims).map { j =>
      val h = md.digest(s"jl_${k}_$j".getBytes("UTF-8"))
      if ((h(0) & 0x01) == 0) scale else -scale
    })
  }
  private def q166(s: SparkSession, dir: String): DataFrame = {
    val ys = Similarity.linearScores(col("embedding"), JlSigns,
      Seq.fill(JlOutDims)(0.0))
    Tables.embeddings(s, dir).select(
      col("vec_id") +: ys.zipWithIndex.map { case (c, k) =>
        round(c, 6).as(s"y$k") }: _*)
  }
  private val q166Sql = {
    val yCols = JlSigns.zipWithIndex.map { case (row, k) =>
      s"round(list_dot_product(v, ${row.mkString("[", ", ", "]")}), 6) AS y$k"
    }.mkString(",\n|  ")
    s"""SELECT vec_id,
       |  $yCols
       |FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)""".stripMargin
  }

  // --------------------------------------------------------- q167
  /** Jaccard histogram over ALL LSH candidate pairs (no verify
    * threshold): similarity mass bucketed in 0.05 steps — the curve a
    * threshold-tuning pass reads next to q144's S-curve planner (how
    * many pairs would each cut keep?) and the empirical check on the
    * banding's candidate quality. The bucket is EXACT integer
    * arithmetic — `(20·|∩|) div |∪|` — so no float edge can flicker a
    * pair across buckets. Same band equi-join as q28; two keyed set
    * joins; output bounded by 21 rows. */
  private def q167(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bands = Dedup
      .bandKeys(docs, "text", "doc_id", Bands, RowsPerBand, ShingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sets = docs.select(col("doc_id"),
      array_distinct(Dedup.words(col("text"))).as("toks"))
    Dedup.candidatePairs(bands)
      .join(sets.select(col("doc_id").as("id_a"), col("toks").as("ta")),
        Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("toks").as("tb")),
        Seq("id_b"))
      .select(expr("(20L * size(array_intersect(ta, tb))) div " +
        "size(array_union(ta, tb))").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("bucket"), round(col("bucket") / lit(20.0), 2).as("jaccard_lo"),
        col("n_pairs"))
  }
  private val q167Sql =
    s"""WITH $BandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct($WsSplit) AS toks FROM documents),
       |b AS (SELECT (20 * len(list_intersect(sa.toks, sb.toks)))
       |        // len(list_distinct(list_concat(sa.toks, sb.toks))) AS bucket
       |      FROM pairs JOIN sets sa ON id_a = sa.doc_id
       |        JOIN sets sb ON id_b = sb.doc_id)
       |SELECT CAST(bucket AS BIGINT) AS bucket,
       |  round(bucket / 20.0, 2) AS jaccard_lo,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM b GROUP BY bucket""".stripMargin

  val queries: Map[String, Q] = Map(
    "q26_dedup_exact" -> q26 _,
    "q27_minhash_bands" -> q27 _,
    "q28_neardup_pairs" -> q28 _,
    "q29_fingerprint_dedup" -> q29 _,
    "q30_simhash" -> q30 _,
    "q31_ann_cosine" -> q31 _,
    "q32_ann_lsh" -> q32 _,
    "q33_lang_id" -> q33 _,
    "q34_text_quality" -> q34 _,
    "q35_token_count" -> q35 _,
    "q36_multimodal_meta" -> q36 _,
    "q37_embed_neardup" -> q37 _,
    "q38_simhash_clusters" -> q38 _,
    "q39_dedup_keep" -> q39 _,
    "q40_sessionize" -> q40 _,
    "q42_multimodal_decode" -> q42 _,
    "q43_ann_ivf" -> q43 _,
    "q44_winnow_fp" -> q44 _,
    "q45_frame_sample" -> q45 _,
    "q48_ngram_jaccard" -> q48 _,
    "q49_bm25" -> q49 _,
    "q50_dedup_clusters" -> q50 _,
    "q52_winnow_overlap" -> q52 _,
    "q57_hash_split" -> q57 _,
    "q59_repetition" -> q59 _,
    "q61_decontaminate" -> q61 _,
    "q62_redact_pii" -> q62 _,
    "q66_token_budget" -> q66 _,
    "q67_clean_corpus" -> q67 _,
    "q68_dupchain_walk" -> q68 _,
    "q69_edit_distance" -> q69 _,
    "q72_unigram_lm" -> q72 _,
    "q73_chunking" -> q73 _,
    "q75_curation_report" -> q75 _,
    "q79_shard_manifest" -> q79 _,
    "q80_embed_backlog" -> q80 _,
    "q81_hard_negatives" -> q81 _,
    "q82_tfidf_terms" -> q82 _,
    "q85_pq_codes" -> q85 _,
    "q89_cluster_merge" -> q89 _,
    "q93_mad_outliers" -> q93 _,
    "q96_bigram_pmi" -> q96 _,
    "q97_neardup_triangles" -> q97 _,
    "q98_length_histogram" -> q98 _,
    "q103_normalize_text" -> q103 _,
    "q104_label_centroids" -> q104 _,
    "q105_passage_dedup" -> q105 _,
    "q106_centroid_outliers" -> q106 _,
    "q107_semantic_decontaminate" -> q107 _,
    "q108_stopword_ratio" -> q108 _,
    "q109_containment_pairs" -> q109 _,
    "q110_balanced_shards" -> q110 _,
    "q111_source_cap" -> q111 _,
    "q112_int8_quant" -> q112 _,
    "q113_bloom_dedup" -> q113 _,
    "q114_char_entropy" -> q114 _,
    "q115_mixture_weights" -> q115 _,
    "q116_quality_deciles" -> q116 _,
    "q117_boilerplate" -> q117 _,
    "q118_semdedup_pairs" -> q118 _,
    "q122_semdedup_keep" -> q122 _,
    "q123_neardup_degrees" -> q123 _,
    "q125_weighted_sample" -> q125 _,
    "q127_ngram_novelty" -> q127 _,
    "q128_ngram_decontam" -> q128 _,
    "q129_dimension_stats" -> q129 _,
    "q130_pagerank" -> q130 _,
    "q131_hybrid_rrf" -> q131 _,
    "q132_source_drift" -> q132 _,
    "q133_exact_jaccard_join" -> q133 _,
    "q134_heavy_hitters" -> q134 _,
    "q135_linear_classifier" -> q135 _,
    "q136_blocking_pairs" -> q136 _,
    "q137_kmeans" -> q137 _,
    "q138_xsource_overlap" -> q138 _,
    "q139_modal_lang" -> q139 _,
    "q140_score_fusion" -> q140 _,
    "q141_group_sample" -> q141 _,
    "q142_context_packing" -> q142 _,
    "q143_substring_dedup" -> q143 _,
    "q144_lsh_planner" -> q144 _,
    "q145_hamming_neighbors" -> q145 _,
    "q146_bigram_xent" -> q146 _,
    "q147_source_datasheet" -> q147 _,
    "q148_zipf_slope" -> q148 _,
    "q149_tfidf_neighbors" -> q149 _,
    "q150_dsir_weights" -> q150 _,
    "q151_temperature_mix" -> q151 _,
    "q152_sentence_dedup" -> q152 _,
    "q153_tokenizer_fertility" -> q153 _,
    "q154_calibration_bins" -> q154 _,
    "q156_gopher_rules" -> q156 _,
    "q158_vocab_coverage" -> q158 _,
    "q159_filter_funnel" -> q159 _,
    "q160_shard_skew" -> q160 _,
    "q161_cluster_size_hist" -> q161 _,
    "q162_langid_confusion" -> q162 _,
    "q165_power_iteration" -> q165 _,
    "q166_jl_projection" -> q166 _,
    "q167_jaccard_histogram" -> q167 _)

  val oracles: Map[String, String] = Map(
    "q26_dedup_exact" -> q26Sql,
    "q27_minhash_bands" -> q27Sql,
    "q28_neardup_pairs" -> q28Sql,
    "q29_fingerprint_dedup" -> q29Sql,
    "q30_simhash" -> q30Sql,
    "q31_ann_cosine" -> q31Sql,
    "q32_ann_lsh" -> q32Sql,
    "q33_lang_id" -> q33Sql,
    "q34_text_quality" -> q34Sql,
    "q35_token_count" -> q35Sql,
    "q36_multimodal_meta" -> q36Sql,
    "q37_embed_neardup" -> q37Sql,
    "q38_simhash_clusters" -> q38Sql,
    "q43_ann_ivf" -> q43Sql,
    "q44_winnow_fp" -> q44Sql,
    "q45_frame_sample" -> q45Sql,
    "q48_ngram_jaccard" -> q48Sql,
    "q49_bm25" -> q49Sql,
    "q50_dedup_clusters" -> q50Sql,
    "q52_winnow_overlap" -> q52Sql,
    "q39_dedup_keep" -> q39Sql,
    "q40_sessionize" -> q40Sql,
    "q42_multimodal_decode" -> q42Sql,
    "q57_hash_split" -> q57Sql,
    "q59_repetition" -> q59Sql,
    "q61_decontaminate" -> q61Sql,
    "q62_redact_pii" -> q62Sql,
    "q66_token_budget" -> q66Sql,
    "q67_clean_corpus" -> q67Sql,
    "q68_dupchain_walk" -> q68Sql,
    "q69_edit_distance" -> q69Sql,
    "q72_unigram_lm" -> q72Sql,
    "q73_chunking" -> q73Sql,
    "q75_curation_report" -> q75Sql,
    "q79_shard_manifest" -> q79Sql,
    "q80_embed_backlog" -> q80Sql,
    "q81_hard_negatives" -> q81Sql,
    "q82_tfidf_terms" -> q82Sql,
    "q85_pq_codes" -> q85Sql,
    "q89_cluster_merge" -> q89Sql,
    "q93_mad_outliers" -> q93Sql,
    "q96_bigram_pmi" -> q96Sql,
    "q97_neardup_triangles" -> q97Sql,
    "q98_length_histogram" -> q98Sql,
    "q103_normalize_text" -> q103Sql,
    "q104_label_centroids" -> q104Sql,
    "q105_passage_dedup" -> q105Sql,
    "q106_centroid_outliers" -> q106Sql,
    "q107_semantic_decontaminate" -> q107Sql,
    "q108_stopword_ratio" -> q108Sql,
    "q109_containment_pairs" -> q109Sql,
    "q110_balanced_shards" -> q110Sql,
    "q111_source_cap" -> q111Sql,
    "q112_int8_quant" -> q112Sql,
    "q113_bloom_dedup" -> q113Sql,
    "q114_char_entropy" -> q114Sql,
    "q115_mixture_weights" -> q115Sql,
    "q116_quality_deciles" -> q116Sql,
    "q117_boilerplate" -> q117Sql,
    "q118_semdedup_pairs" -> q118Sql,
    "q122_semdedup_keep" -> q122Sql,
    "q123_neardup_degrees" -> q123Sql,
    "q125_weighted_sample" -> q125Sql,
    "q127_ngram_novelty" -> q127Sql,
    "q128_ngram_decontam" -> q128Sql,
    "q129_dimension_stats" -> q129Sql,
    "q130_pagerank" -> q130Sql,
    "q131_hybrid_rrf" -> q131Sql,
    "q132_source_drift" -> q132Sql,
    "q133_exact_jaccard_join" -> q133Sql,
    "q134_heavy_hitters" -> q134Sql,
    "q135_linear_classifier" -> q135Sql,
    "q136_blocking_pairs" -> q136Sql,
    "q137_kmeans" -> q137Sql,
    "q138_xsource_overlap" -> q138Sql,
    "q139_modal_lang" -> q139Sql,
    "q140_score_fusion" -> q140Sql,
    "q141_group_sample" -> q141Sql,
    "q142_context_packing" -> q142Sql,
    "q143_substring_dedup" -> q143Sql,
    "q144_lsh_planner" -> q144Sql,
    "q145_hamming_neighbors" -> q145Sql,
    "q146_bigram_xent" -> q146Sql,
    "q147_source_datasheet" -> q147Sql,
    "q148_zipf_slope" -> q148Sql,
    "q149_tfidf_neighbors" -> q149Sql,
    "q150_dsir_weights" -> q150Sql,
    "q151_temperature_mix" -> q151Sql,
    "q152_sentence_dedup" -> q152Sql,
    "q153_tokenizer_fertility" -> q153Sql,
    "q154_calibration_bins" -> q154Sql,
    "q156_gopher_rules" -> q156Sql,
    "q158_vocab_coverage" -> q158Sql,
    "q159_filter_funnel" -> q159Sql,
    "q160_shard_skew" -> q160Sql,
    "q161_cluster_size_hist" -> q161Sql,
    "q162_langid_confusion" -> q162Sql,
    "q165_power_iteration" -> q165Sql,
    "q166_jl_projection" -> q166Sql,
    "q167_jaccard_histogram" -> q167Sql)
}
