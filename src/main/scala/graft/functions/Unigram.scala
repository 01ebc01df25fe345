package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM subword tokenization (the SentencePiece unigram model,
  * Kudo 2018) — the other mainstream trainable tokenizer beside
  * [[Bpe]], and the one real pipelines reach for when they need
  * sampling-free deterministic segmentation with an explicit
  * per-piece likelihood.
  *
  * Model: a piece → log-probability table. Encoding a word is a
  * VITERBI pass over its segmentation lattice — the max-total-log-prob
  * split — with a deterministic tie-break (fewer pieces, then the
  * longer piece preferred from the END backwards: the DP's per-position
  * choice of the longest last piece recurses into the prefix), so a
  * model segments identically on every executor and every run.
  *
  * Training is Viterbi-EM (hard EM — the standard lattice E-step's
  * deterministic little sibling) over a BOUNDED driver-side sample,
  * exactly the [[Bpe.trainFromCorpus]] discipline: tokenizer training
  * is a sampled offline step, never a distributed pass over 100 TB.
  *  1. seed: all substrings up to `maxPieceLen` with frequency ≥ 2,
  *     scored by freq × len, top `seedSize` kept + every single char;
  *  2. E: segment every sampled word with the current model, count
  *     piece usage; M: piece log-prob = log(count / total);
  *  3. prune: drop the lowest-count multi-char pieces (20% per round)
  *     until `vocabSize` remains (single chars are never pruned —
  *     they are the closed fallback alphabet, so ANY string encodes).
  *
  * The distributed encode ships the model once as a codegen reference
  * object ([[UnigramEncodeExpr]], the [[DictionaryMatchExpr]] shape) —
  * one O(len · maxPieceLen) kernel per word inside whole-stage
  * codegen. Segmentation is LOSSLESS by construction (pieces
  * concatenate back to the word), which is what the `t63` gate's
  * identity oracle checks; Viterbi optimality is property-tested
  * against brute-force enumeration in UnigramSpec. */
object Unigram {

  final case class UnigramModel(pieces: Map[String, Double])
      extends Serializable {

    @transient private lazy val maxLen: Int =
      if (pieces.isEmpty) 1 else pieces.keysIterator.map(_.length).max

    /** Viterbi segmentation of one word. Unknown characters (absent
      * from even the fallback alphabet) become their own pieces at a
      * harsh constant penalty — data is data, never an exception. */
    def segment(word: String): Vector[String] = {
      val n = word.length
      if (n == 0) return Vector.empty
      val NegInf = Double.NegativeInfinity
      val unkLogP = -1e4
      // best(i): (score, pieceCount, backPointer = start of last piece)
      val score = Array.fill(n + 1)(NegInf)
      val count = Array.fill(n + 1)(Int.MaxValue)
      val back = Array.fill(n + 1)(-1)
      score(0) = 0.0; count(0) = 0
      var i = 1
      while (i <= n) {
        var l = math.min(i, math.max(maxLen, 1))
        while (l >= 1) {
          val s = i - l
          if (score(s) != NegInf) {
            val piece = word.substring(s, i)
            val lp =
              if (pieces.contains(piece)) pieces(piece)
              else if (l == 1) unkLogP // unknown char fallback
              else NegInf
            if (lp != NegInf) {
              val sc = score(s) + lp
              val ct = count(s) + 1
              // better score; tie → fewer pieces; tie → longer last
              // piece (i.e. smaller back pointer)
              val better = sc > score(i) ||
                (sc == score(i) && (ct < count(i) ||
                  (ct == count(i) && s < back(i))))
              if (better) { score(i) = sc; count(i) = ct; back(i) = s }
            }
          }
          l -= 1
        }
        i += 1
      }
      // reconstruct
      val out = mutable.ArrayBuffer.empty[String]
      var p = n
      while (p > 0) { out += word.substring(back(p), p); p = back(p) }
      out.reverseIterator.toVector
    }

    /** Piece count of a whitespace-pre-tokenized text. */
    def countPieces(text: String): Long = {
      val t = text.trim
      if (t.isEmpty) 0L
      else t.split("\\s+").foldLeft(0L)((a, w) => a + segment(w).length)
    }
  }

  /** Train from word frequencies (see the object doc for the recipe).
    * Deterministic: seed scoring, EM and pruning all tie-break
    * lexicographically. */
  def train(
      wordFreq: Map[String, Long],
      vocabSize: Int = 512,
      maxPieceLen: Int = 8,
      seedSize: Int = 4096,
      emRounds: Int = 2): UnigramModel = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val chars: Set[String] =
      wordFreq.keysIterator.flatMap(_.map(_.toString)).toSet
    // 1. seed candidates
    val subCount = mutable.Map.empty[String, Long]
    wordFreq.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 2
        while (l <= maxPieceLen && i + l <= w.length) {
          val s = w.substring(i, i + l)
          subCount(s) = subCount.getOrElse(s, 0L) + f
          l += 1
        }
        i += 1
      }
    }
    val seeds = subCount.iterator.filter(_._2 >= 2).toSeq
      .sortBy { case (s, c) => (-(c * s.length), s) }
      .take(seedSize).map(_._1)
    var vocab: Set[String] = chars ++ seeds
    var model = uniform(vocab)
    // 2-3. EM + prune until the vocab fits
    var continue = true
    while (continue) {
      for (_ <- 1 to emRounds) model = emRound(model, vocab, wordFreq)
      val multi = vocab.filterNot(_.length == 1)
      if (chars.size + multi.size <= vocabSize) continue = false
      else if (multi.isEmpty) continue = false // vocabSize < |alphabet|:
        // the closed fallback alphabet is the floor — never pruned
      else {
        val keep = math.max(vocabSize - chars.size,
          (multi.size * 4) / 5) match {
          case k if k >= multi.size => multi.size - 1 // always shrink
          case k => k
        }
        // usage from the CURRENT model's segmentation decides survival
        val usage = pieceUsage(model, wordFreq)
        val kept = multi.toSeq
          .sortBy(p => (-usage.getOrElse(p, 0L), p))
          .take(math.max(keep, 0)).toSet
        vocab = chars ++ kept
        model = renormalize(model, vocab)
      }
    }
    for (_ <- 1 to emRounds) model = emRound(model, vocab, wordFreq)
    model
  }

  private def uniform(vocab: Set[String]): UnigramModel = {
    val lp = math.log(1.0 / math.max(vocab.size, 1))
    UnigramModel(vocab.iterator.map(_ -> lp).toMap)
  }

  private def renormalize(m: UnigramModel, vocab: Set[String]): UnigramModel =
    UnigramModel(m.pieces.view.filterKeys(vocab).toMap match {
      case p if p.isEmpty => uniform(vocab).pieces
      case p => p
    })

  private def pieceUsage(m: UnigramModel,
      wordFreq: Map[String, Long]): Map[String, Long] = {
    val usage = mutable.Map.empty[String, Long]
    wordFreq.foreach { case (w, f) =>
      m.segment(w).foreach(p => usage(p) = usage.getOrElse(p, 0L) + f)
    }
    usage.toMap
  }

  /** One hard-EM round: segment with the current model, re-estimate
    * log-probs from usage (Laplace-smoothed so an unused piece keeps a
    * finite, small probability and can re-enter later). */
  private def emRound(m: UnigramModel, vocab: Set[String],
      wordFreq: Map[String, Long]): UnigramModel = {
    val usage = pieceUsage(m, wordFreq)
    val total = usage.valuesIterator.sum.toDouble + vocab.size
    UnigramModel(vocab.iterator.map { p =>
      p -> math.log((usage.getOrElse(p, 0L) + 1.0) / total)
    }.toMap)
  }

  /** Train from a corpus DataFrame — bounded driver-side sample, the
    * [[Bpe.trainFromCorpus]] shape. */
  def trainFromCorpus(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      vocabSize: Int = 512, sampleDocs: Int = 256): UnigramModel = {
    val texts = df.select(textCol).limit(sampleDocs).collect()
      .map(r => Option(r.getString(0)).getOrElse(""))
    val freq = mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val tr = t.trim
      if (tr.nonEmpty)
        tr.split("\\s+").foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1L)
    }
    train(freq.toMap, vocabSize)
  }

  /** Corpus-exact training — the [[Bpe.trainFromCorpusExact]] discipline
    * applied to the unigram trainer: the EM loop stays driver-side (it
    * is inherently iterative) but its input is [[Bpe.wordHistogram]]'s
    * exact distributed word-frequency aggregate capped at `maxVocab`
    * rows, not a document sample — a corpus-dominant word outside the
    * first `sampleDocs` documents cannot be missed. Deterministic in
    * (corpus, vocabSize, maxVocab). */
  def trainFromCorpusExact(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      vocabSize: Int = 512, maxVocab: Int = 65536): UnigramModel = {
    val freq = Bpe.wordHistogram(df, textCol, maxVocab)
      .select("word", "freq").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    train(freq, vocabSize)
  }
}

/** Per-word unigram segmentation over a text column: whitespace
  * pre-tokenization (the [[Bpe.encodeTokens]] contract), each word
  * Viterbi-segmented, piece runs concatenated in document order.
  * The model rides as a codegen reference object — built once
  * driver-side, shipped per task, shared by every row. */
case class UnigramEncodeExpr(child: Expression,
    model: Unigram.UnigramModel) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode expects STRING input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    UnigramEncodeExpr.encode(model, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramModel", model,
      classOf[Unigram.UnigramModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramEncodeExpr.encode($m, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "unigram_encode"
}

object UnigramEncodeExpr {
  def apply(text: Column, model: Unigram.UnigramModel): Column =
    GraftInternals.column(UnigramEncodeExpr(
      GraftInternals.expression(text), model))

  /** Static kernel shared by interpreted eval and generated code. */
  def encode(model: Unigram.UnigramModel, text: UTF8String): ArrayData = {
    val t = text.toString.trim
    val out =
      if (t.isEmpty) Array.empty[Any]
      else t.split("\\s+").iterator
        .flatMap(model.segment)
        .map(p => UTF8String.fromString(p): Any).toArray
    new GenericArrayData(out)
  }
}
