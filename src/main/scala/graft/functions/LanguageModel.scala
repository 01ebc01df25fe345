package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Add-k smoothed bigram language model for perplexity-based quality
  * filtering — the standard "drop documents a small LM finds surprising"
  * step of web-corpus pipelines (the role KenLM plays in CCNet/RedPajama).
  *
  * 100 TB shape:
  *  - TRAINING is two distributed count aggregations (unigrams, bigrams)
  *    truncated to a BOUNDED model (`maxVocab`/`maxBigrams`, deterministic
  *    count-desc/lexicographic tie-break ordering) — the only driver
  *    materialization is the model itself, and a corpus that large should
  *    train on a hash-sample (`sampleDocs`), same as [[Bpe.trainFromCorpus]];
  *  - SCORING is embarrassingly parallel: the model ships to executors ONCE
  *    as a broadcast and each partition streams through a mapPartitions
  *    batch — no shuffle, no per-row closure state.
  *
  * Truncation makes rare n-grams look unseen (slightly pessimistic
  * perplexity for rare-word documents) — the standard memory/quality trade.
  */
object LanguageModel {

  /** Bounded bigram LM. `vocab` is the smoothing denominator's V (retained
    * vocabulary + 1 OOV bucket). Keys are exact token strings; bigram keys
    * are "w1 w2" (tokens are whitespace-split, so the separator cannot appear inside them). */
  case class BigramLm(
      k: Double,
      vocab: Int,
      unigrams: Map[String, Long],
      bigrams: Map[String, Long]) {
    def bigramKey(a: String, b: String): String = a + " " + b

    /** log P(b | a) with add-k smoothing over V. */
    def logProb(a: String, b: String): Double = {
      val cBi = bigrams.getOrElse(bigramKey(a, b), 0L)
      val cUni = unigrams.getOrElse(a, 0L)
      math.log((cBi + k) / (cUni + k * vocab))
    }
  }

  /** Train on (a hash-sample of) `df`'s text column. Deterministic: counts
    * aggregate exactly; truncation orders by (count desc, token asc). */
  def train(
      df: DataFrame,
      textCol: String,
      k: Double = 0.1,
      maxVocab: Int = 65536,
      maxBigrams: Int = 262144,
      sampleDocs: Int = 0): BigramLm = {
    require(k > 0, "smoothing k must be positive")
    val base0 = df.select(TextFunctions.words(col(textCol)).as("w"))
    // bounded, deterministic sample for very large corpora: hash-order and
    // take the first N docs (same shape as Ann's IVF seeding / Bpe training)
    val base = if (sampleDocs > 0)
      base0.orderBy(xxhash64(col("w")), col("w")).limit(sampleDocs) else base0
    val uniRows = base.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("t")).limit(maxVocab).collect()
    val unigrams = uniRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // sub-2-token docs have no bigrams — and must be filtered BEFORE the
    // window transform: sequence(0, size-2) on size 0/1 is a DESCENDING
    // sequence whose element_at(0 / out-of-range) throws under ANSI
    val biRows = base.filter(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("w")) - 2),
        i => concat_ws(" ", element_at(col("w"), i + 1),
          element_at(col("w"), i + 2)))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("b")).limit(maxBigrams).collect()
    // drop bigrams whose prefix unigram fell out of the retained vocab:
    // with count(prefix) truncated to 0 the smoothed P(b|a) is unnormalized
    // (can exceed 1 once cBi > k*V), inflating fluency for exactly the
    // rare-prefix docs a perplexity filter is meant to catch
    val bigrams = biRows.map(r => r.getString(0) -> r.getLong(1))
      .filter { case (key, _) => unigrams.contains(key.split(" ", 2).head) }
      .toMap
    BigramLm(k, unigrams.size + 1, unigrams, bigrams)
  }

  /** Per-document perplexity under `lm`: (idCol, n_tokens, avg_logprob,
    * perplexity). Documents with fewer than 2 tokens have no bigrams —
    * null scores. Model broadcast once; scoring is shuffle-free. */
  /** Stupid-backoff trigram LM (Brants et al., EMNLP 2007: "Large Language
    * Models in Machine Translation"): an unnormalized SCORE, not a smoothed
    * probability — the huge-corpus trade the paper showed is as good as
    * Kneser-Ney for ranking/filtering at a fraction of the cost, which is
    * exactly a quality-filter's use case. `alpha` defaults to 0.5 rather
    * than the paper's 0.4: a power of two, so `alpha` and `alpha²` are
    * exact doubles and the scoring arithmetic replays bit-identically
    * across engines (0.4 parses as decimal elsewhere and `0.4·0.4` differs
    * from the double product in the last ulp).
    *
    * Backoff chain for S(c | a b), each branch requiring its denominator
    * count to be present (truncated models back off rather than divide by
    * a missing prefix): trigram MLE → α·bigram MLE → α²·unigram MLE →
    * α²·(0.5/total) floor for OOV. */
  case class TrigramLm(
      alpha: Double,
      total: Long,
      unigrams: Map[String, Long],
      bigrams: Map[String, Long],
      trigrams: Map[String, Long]) {
    def logScore(a: String, b: String, c: String): Double = {
      val cTri = trigrams.get(a + " " + b + " " + c)
      val cBi12 = bigrams.get(a + " " + b)
      if (cTri.isDefined && cBi12.isDefined)
        math.log(cTri.get.toDouble / cBi12.get)
      else {
        val cBi23 = bigrams.get(b + " " + c)
        val cUni2 = unigrams.get(b)
        if (cBi23.isDefined && cUni2.isDefined)
          math.log(alpha * (cBi23.get.toDouble / cUni2.get))
        else unigrams.get(c) match {
          case Some(cu) => math.log(alpha * alpha * (cu.toDouble / total))
          case None => math.log(alpha * alpha * (0.5 / total))
        }
      }
    }
  }

  /** Train a bounded trigram model: three distributed count aggregations
    * (unigram/bigram/trigram), each truncated deterministically
    * (count desc, key asc); `total` is the FULL token count (one extra
    * cheap count job), so the unigram-MLE floor stays consistent under
    * truncation. Same sampling/bounding contract as [[train]]. */
  def trainTrigram(
      df: DataFrame,
      textCol: String,
      alpha: Double = 0.5,
      maxVocab: Int = 65536,
      maxBigrams: Int = 262144,
      maxTrigrams: Int = 1 << 20,
      sampleDocs: Int = 0): TrigramLm = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val base0 = df.select(TextFunctions.words(col(textCol)).as("w"))
    val base = if (sampleDocs > 0)
      base0.orderBy(xxhash64(col("w")), col("w")).limit(sampleDocs) else base0
    def ngramCounts(n: Int, cap: Int) = {
      val grams =
        if (n == 1) base.select(explode(col("w")).as("g"))
        else base.filter(size(col("w")) >= n)
          .select(explode(transform(sequence(lit(0), size(col("w")) - n),
            i => concat_ws(" ", (0 until n).map(j =>
              element_at(col("w"), i + j + 1)): _*))).as("g"))
      grams.groupBy("g").agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), asc("g")).limit(cap).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val total = base.select(sum(size(col("w"))).cast("long")).head().getLong(0)
    TrigramLm(alpha, total, ngramCounts(1, maxVocab),
      ngramCounts(2, maxBigrams), ngramCounts(3, maxTrigrams))
  }

  /** Per-document mean log-score under a broadcast [[TrigramLm]] — the
    * scoring twin of [[perplexity]] (no shuffle, model ships once, docs
    * under 3 tokens score null). Returns
    * (idCol, n_tokens, avg_logscore, backoff_ppl = exp(−avg)). */
  /** The [[TrigramLm]] re-keyed for the scoring hot loop: tokens intern
    * to ints once per document, n-gram keys pack into one long, counts
    * live in specialized long maps — no string building or string
    * hashing per trigram (the string-keyed loop spent most of its time
    * there: 3 concats + 3 string hashes × every token of the corpus).
    * Branch semantics are EXACTLY [[TrigramLm.logScore]]'s: a query
    * token with no id can belong to no stored key, so the -1 guards
    * reproduce the `Map.get` misses bit-for-bit, and the arithmetic is
    * unchanged — gates hash identically. Packing needs ids < 2²¹; a
    * model whose key tokens exceed that (possible only near the
    * maxTrigrams cap on an adversarial vocabulary) falls back to the
    * string loop. */
  private final class IndexedTrigramLm(
      val alpha: Double,
      val total: Long,
      val tokenIds: java.util.HashMap[String, Integer],
      val uniCounts: Array[Long],
      val bi: scala.collection.mutable.LongMap[Long],
      val tri: scala.collection.mutable.LongMap[Long]) extends Serializable {

    def score(wid: Array[Int], i: Int): Double = {
      val a = wid(i - 2); val b = wid(i - 1); val c = wid(i)
      val cTri = if (a >= 0 && b >= 0 && c >= 0)
        tri.getOrElse((a.toLong << 42) | (b.toLong << 21) | c, -1L) else -1L
      val cBi12 = if (a >= 0 && b >= 0)
        bi.getOrElse((a.toLong << 21) | b, -1L) else -1L
      if (cTri >= 0 && cBi12 >= 0) math.log(cTri.toDouble / cBi12)
      else {
        val cBi23 = if (b >= 0 && c >= 0)
          bi.getOrElse((b.toLong << 21) | c, -1L) else -1L
        val cUni2 = if (b >= 0) uniCounts(b) else -1L
        if (cBi23 >= 0 && cUni2 >= 0)
          math.log(alpha * (cBi23.toDouble / cUni2))
        else {
          val cu = if (c >= 0) uniCounts(c) else -1L
          if (cu >= 0) math.log(alpha * alpha * (cu.toDouble / total))
          else math.log(alpha * alpha * (0.5 / total))
        }
      }
    }
  }

  private def indexLm(lm: TrigramLm): IndexedTrigramLm = {
    val ids = new java.util.HashMap[String, Integer]()
    def id(t: String): Int = {
      val got = ids.get(t)
      if (got != null) got.intValue()
      else { val v = ids.size; ids.put(t, v); v }
    }
    lm.unigrams.keysIterator.foreach(id)
    lm.bigrams.keysIterator.foreach(_.split(' ').foreach(id))
    lm.trigrams.keysIterator.foreach(_.split(' ').foreach(id))
    if (ids.size >= (1 << 21)) return null // fall back to string keys
    val uni = Array.fill(ids.size)(-1L)
    lm.unigrams.foreach { case (t, c) => uni(id(t)) = c }
    val bi = scala.collection.mutable.LongMap.empty[Long]
    lm.bigrams.foreach { case (k, c) =>
      val p = k.split(' ')
      bi((id(p(0)).toLong << 21) | id(p(1))) = c
    }
    val tri = scala.collection.mutable.LongMap.empty[Long]
    lm.trigrams.foreach { case (k, c) =>
      val p = k.split(' ')
      tri((id(p(0)).toLong << 42) | (id(p(1)).toLong << 21) | id(p(2))) = c
    }
    new IndexedTrigramLm(lm.alpha, lm.total, ids, uni, bi, tri)
  }

  def backoffScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lm: TrigramLm): DataFrame = {
    val spark = df.sparkSession
    val indexed = indexLm(lm)
    val bcIdx = if (indexed != null)
      spark.sparkContext.broadcast(indexed) else null
    val bc = if (indexed == null) spark.sparkContext.broadcast(lm) else null
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("avg_logscore", DoubleType, nullable = true),
      StructField("backoff_ppl", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as(idCol), TextFunctions.words(col(textCol)))
      .filter(col(idCol).isNotNull)
      .mapPartitions { rows =>
        val m = if (bc != null) bc.value else null
        val ix = if (bcIdx != null) bcIdx.value else null
        rows.map { r =>
          val id = r.getLong(0)
          val words = if (r.isNullAt(1)) Seq.empty[String] else r.getSeq[String](1)
          val n = words.length.toLong
          if (n < 3) Row(id, n, null, null)
          else {
            var sum = 0.0
            if (ix != null) {
              val wid = new Array[Int](words.length)
              var j = 0
              while (j < wid.length) {
                val g = ix.tokenIds.get(words(j))
                wid(j) = if (g == null) -1 else g.intValue()
                j += 1
              }
              var i = 2
              while (i < wid.length) { sum += ix.score(wid, i); i += 1 }
            } else {
              var i = 2
              while (i < words.length) {
                sum += m.logScore(words(i - 2), words(i - 1), words(i))
                i += 1
              }
            }
            val avg = sum / (n - 2)
            Row(id, n, avg, math.exp(-avg))
          }
        }
      }(enc)
  }

  def perplexity(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lm: BigramLm): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(lm)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("avg_logprob", DoubleType, nullable = true),
      StructField("perplexity", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // filter on the CASTED id: a non-null but non-numeric id casts to null,
    // which a pre-cast isNotNull filter would let through to NPE at getLong
    df.select(col(idCol).cast("long").as(idCol), TextFunctions.words(col(textCol)))
      .filter(col(idCol).isNotNull) // a null (or uncastable) id cannot key a score row
      .mapPartitions { rows =>
        val m = bc.value
        rows.map { r =>
          val id = r.getLong(0)
          // null text propagates a null words array through the tokenizer
          val words = if (r.isNullAt(1)) Seq.empty[String] else r.getSeq[String](1)
          val n = words.length.toLong
          if (n < 2) Row(id, n, null, null)
          else {
            var sum = 0.0
            var i = 1
            while (i < words.length) {
              sum += m.logProb(words(i - 1), words(i))
              i += 1
            }
            val avg = sum / (n - 1)
            Row(id, n, avg, math.exp(-avg))
          }
        }
      }(enc)
  }
}
