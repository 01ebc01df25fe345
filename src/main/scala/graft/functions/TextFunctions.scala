package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines, built
  * entirely from codegen'd native functions (split / higher-order array
  * functions / hashes) — no UDFs, so every operator stays inside whole-stage
  * codegen and scales linearly with executors.
  */
object TextFunctions {

  /** Whitespace tokenization; empty string => empty array. */
  def words(text: Column): Column = {
    val w = split(trim(text), "\\s+")
    when(trim(text) === "", array().cast("array<string>")).otherwise(w)
  }

  /** Word-level n-gram shingles; documents shorter than n collapse to a
    * single whole-document shingle.
    *
    * PERFORMANCE: `wordsCol` is captured inside a lambda, and Catalyst
    * re-evaluates a captured non-attribute expression per array element —
    * pass a MATERIALIZED column (a prior projection's attribute), never
    * `split(...)` inline, or the tokenizer runs once per shingle. Operators
    * in graft.operators stage their projections accordingly. */
  def shingles(wordsCol: Column, n: Int): Column =
    when(size(wordsCol) < n, array(concat_ws(" ", wordsCol)))
      .otherwise(transform(
        sequence(lit(0), size(wordsCol) - n),
        i => concat_ws(" ", slice(wordsCol, i + 1, lit(n)))))

  /** 64-bit hashes of each shingle (xxhash64 — stable across runs).
    * See the lambda-capture note on [[shingles]]: prefer staging `words`
    * into a column first (shingleHashesFromWords) on hot paths. */
  def shingleHashes(text: Column, n: Int): Column =
    transform(shingles(words(text), n), s => xxhash64(s))

  /** Same, from a materialized words column (attribute-cheap in lambdas). */
  def shingleHashesFromWords(wordsCol: Column, n: Int): Column =
    transform(shingles(wordsCol, n), s => xxhash64(s))

  /** Whitespace token count. */
  def tokenCountWhitespace(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish token count: alphanumeric runs, everything else a separator. */
  def tokenCountBpe(text: Column): Column =
    size(filter(split(text, "[^a-zA-Z0-9]+"), w => w =!= "")).cast("long")

  private val punctClass = "[^.!?,;:]"

  /** Quality metrics: char/word counts, mean word length, punctuation and
    * stopword ratios. All exact arithmetic (int counts + one final double
    * division) so an SQL oracle can reproduce them bit-for-bit. */
  def qualityMetrics(text: Column, stopwords: Seq[String]): Seq[(String, Column)] = {
    val w = words(text)
    val nChars = length(text).cast("long")
    val nWords = size(w).cast("long")
    val nPunct = length(regexp_replace(text, punctClass, "")).cast("long")
    val sw = lit(stopwords.toArray)
    val nStop = size(filter(w, x => array_contains(sw, x))).cast("long")
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "avg_word_len" ->
        (when(nWords === 0, lit(0.0))
          .otherwise((nChars - (nWords - 1)).cast("double") / nWords)),
      "punct_ratio" ->
        when(nChars === 0, lit(0.0)).otherwise(nPunct.cast("double") / nChars),
      "stopword_ratio" ->
        when(nWords === 0, lit(0.0)).otherwise(nStop.cast("double") / nWords))
  }

  /** Default English stopword set used by quality scoring. */
  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this", "are", "was")

  /** Per-language marker words for the n-gram/stopword language heuristic. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "es", "que", "un", "una", "en"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "人", "这", "不"))

  /** Language-ID heuristic: argmax over per-language marker-token counts
    * (deterministic lexicographic tiebreak; "und" = undetermined when no
    * marker hits). A real deployment would swap in char-n-gram profiles;
    * the operator shape (pure Column expression, no shuffle) is the point.
    */
  def langId(text: Column, markers: Map[String, Seq[String]] = langMarkers): Column = {
    val w = words(lower(text))
    val scores: Seq[(String, Column)] = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      lang -> size(filter(w, x => array_contains(lit(ms.toArray), x)))
    }
    val best = scores.reduceLeft[(String, Column)] { case ((bl, bs), (l, s)) =>
      // strictly-greater keeps the lexicographically-first language on ties
      (bl, when(s > bs, s).otherwise(bs))
    }
    scores.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best._2 && s > 0 && acc === "und", lit(l)).otherwise(acc)
    }
  }

  /** Content fingerprint: md5 over the sorted distinct token set — stable
    * under word reordering and duplication (bag-of-words identity). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(text)))).cast("binary"))

  /** Rolling-hash winnowing fingerprint: min xxhash64 over character
    * k-grams — robust to small edits; not SQL-oracle-expressible. */
  def winnowFingerprint(text: Column, k: Int = 8): Column =
    array_min(transform(
      sequence(lit(0), greatest(length(text) - k, lit(0))),
      i => xxhash64(substr(text, i + 1, lit(k)))))
}
