package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField}

/** BYTE-level byte-pair encoding — the production tokenizer recipe
  * (GPT-2 lineage: Radford et al. 2019 §2.2; the reference BPE-ish
  * regex counter at /root/reference is word-level only): the alphabet
  * is the 256 byte values, a regex pre-tokenizer splits text into
  * letter/number/punctuation/whitespace runs (with an optional leading
  * space attached to word runs), and every pre-token's UTF-8 bytes map
  * through a fixed byte→printable-unicode bijection so the merge loop,
  * encoder and oracle replay all operate on plain strings. NO OOV IS
  * REPRESENTABLE: any text — any script, any emoji, any control byte —
  * is a sequence of byte symbols before the first merge.
  *
  * Reuses [[Bpe]]'s merge machinery verbatim (train / encodeWord /
  * sequentialReplaySafe): a byte-mapped pre-token IS a string whose
  * chars are the byte symbols, so word-level and byte-level BPE differ
  * only in alphabet and pre-tokenization — which is exactly the GPT-2
  * observation. Training input is the corpus-exact distributed
  * pre-token histogram ([[Bpe.wordHistogram]]'s shape); counting ships
  * the bounded model in a mapPartitions closure.
  *
  * The PRE-TOKENIZER deliberately deviates from GPT-2's in two
  * documented ways, both forced by cross-engine determinism (the
  * DuckDB oracle replays it in RE2, which has no lookahead): (1) no
  * `\s+(?!\S)` — a whitespace run binds as ONE token instead of
  * donating its last space to the following word; (2) no contraction
  * alternates (`'s|'t|…` — an English-only nicety). Whitespace is an
  * EXPLICIT class `[ \t\n\f\r]` because Java's `\s` includes `\x0B`
  * and RE2's does not — the one place the engines' shorthands diverge.
  */
object ByteBpe {

  /** The shared pre-tokenizer, valid in BOTH Java regex (Spark) and
    * RE2 (the DuckDB oracle): leading-space word runs, number runs,
    * punctuation runs, whitespace runs. Alternation order and greedy
    * quantifiers give identical segmentation under leftmost-first and
    * leftmost-longest semantics (the alternatives are first-char
    * disjoint after the optional space). */
  val PretokenPattern: String =
    "( ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\f\\r]+)"

  private val pretokenRe = PretokenPattern.r

  /** GPT-2's bytes_to_unicode bijection: bytes that are printable and
    * not whitespace-like (33–126, 161–172, 174–255) map to their own
    * code point; the 68 others map to 256+n in discovery order — every
    * symbol is a single visible BMP char, so merges/fixtures/oracles
    * never carry raw control bytes. */
  val byteToChar: Array[Char] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (printable(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
    }
    arr
  }

  private val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** One pre-token's UTF-8 bytes as a string of byte symbols. */
  def mapBytes(pretoken: String): String = {
    val bytes = pretoken.getBytes(StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    bytes.foreach(b => sb.append(byteToChar(b & 0xff)))
    sb.toString
  }

  /** Inverse of [[mapBytes]] over a run of SYMBOLS (each a string of
    * mapped byte chars) — the lossless-decode half of the no-OOV
    * contract. */
  def decode(symbols: Seq[String]): String = {
    val out = new java.io.ByteArrayOutputStream()
    symbols.foreach(_.foreach(c => out.write(charToByte(c))))
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }

  /** Deterministic pre-tokenization; concatenating the pre-tokens
    * reproduces the text byte-for-byte (nothing dropped — whitespace is
    * a token class, not a separator, which is what lets byte-level BPE
    * represent formatting). */
  def pretokenize(text: String): Vector[String] =
    if (text == null || text.isEmpty) Vector.empty
    else pretokenRe.findAllIn(text).toVector

  /** A trained byte-level model: [[Bpe.BpeModel]] merges over the
    * mapped-byte alphabet. */
  final case class ByteBpeModel(model: Bpe.BpeModel) extends Serializable {

    /** Encode raw text to its ordered byte-BPE symbol sequence. */
    def encodeText(text: String): Vector[String] =
      pretokenize(text).flatMap(p => model.encodeWord(mapBytes(p)))

    /** Token count of raw text — includes whitespace runs (byte-level
      * BPE keeps them; the word-level counter's trim/split contract
      * does not apply). */
    def countTokens(text: String): Long =
      if (text == null || text.isEmpty) 0L
      else pretokenize(text)
        .foldLeft(0L)((acc, p) => acc + model.encodeWord(mapBytes(p)).length)
  }

  /** Corpus-exact PRE-TOKEN histogram — [[Bpe.wordHistogram]]'s exact
    * distributed shape (one explode + groupBy with map-side combine,
    * TakeOrderedAndProject cap, post-limit rank window) over the
    * byte-level pre-tokenizer instead of the whitespace split. The
    * pre-tokens stay RAW strings here (the histogram is
    * oracle-checkable text); the byte mapping happens at training time.
    * Returns `(pretoken, freq, vocab_rank)`. */
  def pretokenHistogram(df: DataFrame, textCol: String,
      maxVocab: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(maxVocab >= 1, s"maxVocab must be >= 1; got $maxVocab")
    df.select(explode(regexp_extract_all(coalesce(col(textCol), lit("")),
        lit(PretokenPattern), lit(1))).as("pretoken"))
      .groupBy("pretoken").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("pretoken"))
      .limit(maxVocab)
      .withColumn("vocab_rank",
        row_number().over(Window.orderBy(desc("freq"), col("pretoken")))
          .cast("long"))
  }

  /** Corpus-exact byte-level training: [[pretokenHistogram]]'s exact
    * distributed aggregate, byte-mapped on the driver (a `maxVocab`-row
    * pull — the bounded-model contract), fed to [[Bpe.train]]'s merge
    * loop unchanged. The UTF-8 encode → byte-map composition is
    * injective, so distinct pre-tokens never collide post-mapping. */
  def trainFromCorpusExact(df: DataFrame, textCol: String,
      numMerges: Int = 200, maxVocab: Int = 65536): ByteBpeModel = {
    val freq = pretokenHistogram(df, textCol, maxVocab)
      .select("pretoken", "freq").collect()
      .map(r => mapBytes(r.getString(0)) -> r.getLong(1)).toMap
    ByteBpeModel(Bpe.train(freq, numMerges))
  }

  /** Distributed byte-BPE token counting — [[Bpe.tokenCount]]'s
    * mapPartitions shape with the byte-level encode. */
  def tokenCount(df: DataFrame, textCol: String, model: ByteBpeModel,
      outCol: String = "n_bpe_byte"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(outCol, LongType, nullable = false))
    val idx = inSchema.fieldIndex(textCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val t = r.getString(idx)
        Row.fromSeq(r.toSeq :+ model.countTokens(t))
      }
    }
  }

  /** Per-document byte-BPE SYMBOL sequences ([[Bpe.encodeTokens]]'s
    * shape) — symbols, not ids, so the output is directly
    * oracle-replayable; rank ids are one vocabulary join away. */
  def encodeTokens(df: DataFrame, textCol: String, model: ByteBpeModel,
      outCol: String = "bpe_tokens"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(
      StructField(outCol, ArrayType(StringType, containsNull = false),
        nullable = false))
    val idx = inSchema.fieldIndex(textCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val toks: Seq[String] = model.encodeText(r.getString(idx))
        Row.fromSeq(r.toSeq :+ toks)
      }
    }
  }

  /** The 256-row byte→symbol alphabet as a DataFrame
    * `(byte_val, byte_hex, sym)` — fixture material: the oracle joins
    * `hex(encode(pretoken))` two chars at a time against `byte_hex` to
    * rebuild the symbol string without lookahead or blob surgery. */
  def alphabetTable(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 256).map(b =>
      (b.toLong, f"$b%02X", byteToChar(b).toString))
      .toDF("byte_val", "byte_hex", "sym")
  }
}
