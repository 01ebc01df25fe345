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
