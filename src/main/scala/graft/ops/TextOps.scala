package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-rule
  * additions): token counting, quality scoring, language ID, document
  * fingerprinting. Every kernel is built-in-function arithmetic over the
  * text column — one narrow projection per document, no shuffle at all
  * until an aggregation is requested, so these stream at scan speed over
  * 100 TB. */
object TextOps {

  /** One-pass native text statistics (graft.functions.TextStats): the
    * shared kernel behind token counting, subword estimation, stopword
    * ratios and language ID — identical results to the SQL
    * aggregate/split forms (OpsSpec parity test), one tokenization pass
    * instead of an interpreted HOF per metric. */
  def textStats(text: Column, tables: Seq[Seq[String]]): Column = {
    import org.apache.spark.sql.graft.Bridge.{ofExpr, toExpr}
    ofExpr(graft.functions.TextStats(toExpr(text), tables))
  }

  /** Whitespace token count (0 for blank text). */
  def tokenCount(text: Column): Column = {
    val st = textStats(text, Nil)
    when(st.getField("blank"), lit(0)).otherwise(st.getField("n_tokens"))
  }

  /** BPE-ish subword count estimate: word-boundary pieces + intra-word
    * splits every ~4 chars (the common byte-pair average), the standard
    * cheap pre-tokenization token estimator. */
  def subwordCountEstimate(text: Column): Column = {
    val st = textStats(text, Nil)
    when(st.getField("blank"), lit(0)).otherwise(st.getField("subword_est").cast("int"))
  }

  /** Count of tokens of `lower(trim(text))` that appear in `words`
    * (binary string equality — the `w IN (...)` SQL semantics). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    element_at(textStats(text, Seq(words)).getField("stop_hits"), 1)

  /** SQL reference forms (parity oracles for the kernel; see OpsSpec). */
  private[graft] def tokenCountSql(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  private[graft] def subwordCountEstimateSql(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(expr(s"aggregate(split(trim(${text}), '\\\\s+'), 0, (acc, w) -> acc + greatest(1, CAST(ceil(length(w) / 4.0D) AS INT)))"))

  private[graft] def stopwordHitsSql(text: Column, words: Seq[String]): Column =
    expr(s"aggregate(split(lower(trim($text)), '\\\\s+'), 0, (acc, w) -> acc + IF(w IN (${words.map(w => s"'$w'").mkString(",")}), 1, 0))")

  /** Quality metrics in one projection: lengths, word stats, class ratios. */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val chars = length(t).cast("double")
    val safeChars = greatest(chars, lit(1.0))
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_words", tokenCount(t))
      .withColumn("avg_word_len",
        when(col("n_words") === 0, lit(0.0))
          .otherwise(length(regexp_replace(t, "\\s+", "")).cast("double") / col("n_words")))
      .withColumn("punct_ratio",
        (chars - length(regexp_replace(t, "[.,;:!?'\"()\\[\\]-]", ""))) / safeChars)
      .withColumn("digit_ratio",
        (chars - length(regexp_replace(t, "[0-9]", ""))) / safeChars)
      .withColumn("upper_ratio",
        (chars - length(regexp_replace(t, "[A-Z]", ""))) / safeChars)
      .withColumn("stopword_ratio",
        when(col("n_words") === 0, lit(0.0)).otherwise(
          stopwordHits(t, Stopwords.en).cast("double") / col("n_words")))
  }

  /** Composite quality score in [0,1]: length band + low punct/digit noise
    * + healthy stopword share (the C4/Gopher-style heuristic family). */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    qualityMetrics(df, textCol).withColumn("quality_score",
      round(
        (when(col("n_words").between(5, 100000), 0.25).otherwise(0.0)) +
        (when(col("avg_word_len").between(2.0, 12.0), 0.25).otherwise(0.0)) +
        (when(col("punct_ratio") < 0.2, 0.25).otherwise(0.0)) +
        (when(col("stopword_ratio") > 0.05, 0.25).otherwise(0.0)), 2))

  /** N-gram/stopword language ID over a fixed language set: score each
    * language by stopword hits per word, pick the argmax ("und" when no
    * evidence). One projection, no shuffle; the stopword tables are
    * compile-time literals folded into codegen. */
  def langId(text: Column): Column = {
    val st = textStats(text, Stopwords.tables.map(_._2))
    val nw = greatest(st.getField("n_tokens"), lit(1)).cast("double")
    val scored: Seq[(String, Column)] = Stopwords.tables.zipWithIndex.map {
      case ((lang, _), i) =>
        lang -> (element_at(st.getField("stop_hits"), i + 1).cast("double") / nw)
    }
    val best = scored.tail.foldLeft((lit(Stopwords.tables.head._1), scored.head._2)) {
      case ((bl, bs), (lang, s)) => (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }
    when(best._2 > 0.02, best._1).otherwise(lit("und"))
  }

  /** SQL reference form of [[langId]] (parity oracle). */
  private[graft] def langIdSql(text: Column): Column = {
    val words = expr(s"split(lower(trim($text)), '\\\\s+')")
    def score(stops: Seq[String]): Column =
      stopwordHitsSql(text, stops).cast("double") /
        greatest(size(words), lit(1)).cast("double")
    val scored: Seq[(String, Column)] = Stopwords.tables.map { case (lang, stops) => lang -> score(stops) }
    val best = scored.tail.foldLeft((lit(Stopwords.tables.head._1), scored.head._2)) {
      case ((bl, bs), (lang, s)) => (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }
    when(best._2 > 0.02, best._1).otherwise(lit("und"))
  }

  /** Content fingerprint: md5 of case/punctuation/whitespace-normalized
    * text — the canonical "same content modulo formatting" key. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " ")))

  /** Winnowing-style rolling-hash fingerprint: min/max of hashed word
    * w-grams — robust to local edits, used for fuzzy containment. */
  def rollingFingerprints(text: Column, window: Int = 4): Column =
    expr(
      s"""transform(
         |  sequence(1, greatest(size(split(lower(trim($text)), '\\\\s+')) - ${window - 1}, 1)),
         |  i -> xxhash64(concat_ws(' ', slice(split(lower(trim($text)), '\\\\s+'), i, $window))))""".stripMargin)

  def minFingerprint(text: Column, window: Int = 4): Column =
    array_min(rollingFingerprints(text, window))

  /** md5-based rolling fingerprint variant: same winnowing shape but the
    * per-window hash is md5 hex (slower than xxhash64 — use when the
    * fingerprint must be recomputable by external SQL engines). */
  def rollingFingerprintsMd5(text: Column, window: Int = 4): Column =
    expr(
      s"""transform(
         |  sequence(1, greatest(size(split(lower(trim($text)), '\\\\s+')) - ${window - 1}, 1)),
         |  i -> md5(concat_ws(' ', slice(split(lower(trim($text)), '\\\\s+'), i, $window))))""".stripMargin)

  def minFingerprintMd5(text: Column, window: Int = 4): Column =
    array_min(rollingFingerprintsMd5(text, window))

  /** Corpus vocabulary statistics: the k most frequent token ids across
    * an array<int> token column — explode + hash-aggregate with map-side
    * partial counts (the optimal distributed shape: the shuffle carries
    * at most |vocab| rows per partition, never the corpus), then a
    * TakeOrderedAndProject top-k. Ties break by token id for determinism. */
  def vocabTopK(df: DataFrame, tokensCol: String, k: Int): DataFrame =
    df.select(explode(col(tokensCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(k)

  /** PII patterns used by [[scrubPii]]. Kept inside the RE2 ∩ Java-regex
    * common subset (no lookaround, no backreferences) so an external
    * engine reproduces the scrub byte-for-byte — the q52 oracle reruns
    * the exact same patterns in DuckDB (RE2). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{4}\\b"

  /** PII scrubbing for training corpora: redact emails, IPv4 addresses
    * and phone-shaped digit runs with typed placeholders, emitting
    * per-doc hit counts for audit. Stages are ordered (emails → IPs →
    * phones), each counted on the PREVIOUS stage's text, so a digit
    * sequence inside an already-redacted value is never double-counted.
    * Pure codegen'd projection — no shuffle, streams at scan speed; at
    * 100 TB this runs inside the ingest pass for free. */
  def scrubPii(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "[EMAIL]")
    val t2 = regexp_replace(t1, Ipv4Re, "[IP]")
    val t3 = regexp_replace(t2, PhoneRe, "[PHONE]")
    df.select(col(idCol),
      regexp_count(t0, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t1, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(t2, lit(PhoneRe)).cast("long").as("n_phones"),
      t3.as("scrubbed"))
  }

  /** Distinct lowercase word n-grams (space-joined) — the benchmark-
    * decontamination matching unit (GPT-3-style n-gram overlap checks).
    * Same tokenization as [[rollingFingerprints]]: split(lower(trim)). */
  def wordNgrams(text: Column, n: Int): Column =
    expr(
      s"""array_distinct(transform(
         |  sequence(1, greatest(size(split(lower(trim($text)), '\\\\s+')) - ${n - 1}, 1)),
         |  i -> concat_ws(' ', slice(split(lower(trim($text)), '\\\\s+'), i, $n))))""".stripMargin)

  /** Benchmark decontamination: per corpus doc, how many of its distinct
    * word n-grams appear in ANY benchmark doc — filter `hits >= k` at the
    * call site to drop contaminated training docs.
    *
    * Scale shape: the benchmark n-gram set is distinct-aggregated and
    * BROADCAST (eval sets are small — 10⁵–10⁷ grams — next to a 100 TB
    * corpus, so the corpus side streams map-side with zero shuffle until
    * the per-doc count); set `broadcastBenchmark = false` to fall back to
    * a keyed shuffle join when the benchmark itself is corpus-sized. */
  def contaminationHits(corpus: DataFrame, textCol: String, idCol: String,
                        benchmark: DataFrame, benchTextCol: String,
                        n: Int = 8,
                        broadcastBenchmark: Boolean = true): DataFrame = {
    val benchGrams =
      benchmark.select(explode(wordNgrams(col(benchTextCol), n)).as("gram")).distinct()
    val bg = if (broadcastBenchmark) broadcast(benchGrams) else benchGrams
    // corpus grams are distinct PER DOC (wordNgrams dedups), so the
    // post-join count is "distinct overlapping grams", not occurrences
    corpus.select(col(idCol), explode(wordNgrams(col(textCol), n)).as("gram"))
      .join(bg, "gram")
      .groupBy(col(idCol)).agg(count(lit(1)).as("hits"))
  }

  /** Gopher-style repetition metrics per doc: duplicate-word fraction and
    * the most-repeated word's share of the doc. Explode + keyed
    * aggregations + a [[Sampling.perGroupQuota]] top-1 (map-side
    * WindowGroupLimit) — per-doc state never exceeds the doc's vocabulary,
    * and no doc serializes through one task. */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val words = df.select(col(idCol),
      explode(expr(s"split(lower(trim($textCol)), '\\\\s+')")).as("w"))
    val counts = words.groupBy(col(idCol), col("w")).agg(count(lit(1)).as("cnt"))
    val top = Sampling.perGroupQuota(counts, idCol, 1, col("cnt").desc, col("w"))
      .select(col(idCol), col("w").as("top_word"), col("cnt").as("top_cnt"))
    val stats = counts.groupBy(col(idCol)).agg(
      sum("cnt").as("n_words"), count(lit(1)).as("n_distinct"))
    stats.join(top, idCol)
      .select(col(idCol), col("n_words"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_words"), 4).as("dup_frac"),
        col("top_word"),
        round(col("top_cnt").cast("double") / col("n_words"), 4).as("top_frac"))
  }
}

/** Tiny embedded stopword tables (top function words; public knowledge). */
object Stopwords {
  val en = Seq("the", "and", "of", "to", "a", "in", "is", "it", "you", "that",
    "was", "for", "on", "are", "with", "as", "at", "be", "this", "have")
  val de = Seq("der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit",
    "sie", "auf", "für", "des", "dem", "den", "von", "zu", "im", "es", "war")
  val fr = Seq("le", "la", "les", "et", "est", "je", "pas", "un", "une", "avec",
    "pour", "des", "du", "de", "que", "qui", "dans", "sur", "il", "au")
  val es = Seq("el", "la", "los", "las", "y", "es", "yo", "no", "un", "una",
    "con", "para", "del", "de", "que", "en", "se", "por", "su", "al")
  val tables: Seq[(String, Seq[String])] = Seq("en" -> en, "de" -> de, "fr" -> fr, "es" -> es)
}
