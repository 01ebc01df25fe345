package graft.functions

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — undo UTF-8 text that was misdecoded as
  * Latin-1/Windows-1252 and re-encoded (the ftfy "fix one round of
  * double-encoding" core, Speer 2019): `cafÃ©` → `café`,
  * `â€™` → `’`. Real crawls are full of this — pages declaring the
  * wrong charset, proxies re-encoding — and hash-exact dedup treats
  * every mojibaked variant as a distinct document unless a repair pass
  * runs first (same canonicalization motivation as
  * [[NfcNormalizeExpr]]).
  *
  * Contract (deterministic, conservative — never corrupts clean text):
  * map every char back to the byte Windows-1252 would have decoded it
  * from (chars ≤ 0xFF are their own byte — that covers Latin-1 reads
  * and the C1 gaps cp1252 leaves undefined; the 27 cp1252 specials
  * like `€ ™ ’` map to 0x80–0x9F). If ANY char has no such byte the
  * string is genuine Unicode, not mojibake — returned untouched. The
  * byte stream must then decode as STRICT UTF-8 with at least one
  * multi-byte sequence (a shorter result); otherwise untouched — so
  * correctly-encoded `café` survives (its é byte is invalid UTF-8)
  * while mojibaked `cafÃ©` collapses. Repeats to a fixpoint capped at
  * 3 rounds (double- and triple-encoding occur in the wild). Map-side,
  * codegen'd. */
case class MojibakeRepairExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mojibake_repair expects STRING input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MojibakeRepairImpl.repair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MojibakeRepairImpl.repair($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "mojibake_repair"
}

object MojibakeRepairExpr {
  def apply(text: Column): Column =
    GraftInternals.column(MojibakeRepairExpr(GraftInternals.expression(text)))
}

object MojibakeRepairImpl {

  /** Windows-1252 0x80–0x9F specials, reverse-mapped (char → byte).
    * 0x81/0x8D/0x8F/0x90/0x9D are undefined in cp1252 — readers fall
    * back to the C1 controls U+0081… for them, which the ≤ 0xFF
    * identity branch already covers. */
  private val cp1252Rev: java.util.HashMap[Character, java.lang.Byte] = {
    val pairs = Seq(
      0x20AC -> 0x80, 0x201A -> 0x82, 0x0192 -> 0x83, 0x201E -> 0x84,
      0x2026 -> 0x85, 0x2020 -> 0x86, 0x2021 -> 0x87, 0x02C6 -> 0x88,
      0x2030 -> 0x89, 0x0160 -> 0x8A, 0x2039 -> 0x8B, 0x0152 -> 0x8C,
      0x017D -> 0x8E, 0x2018 -> 0x91, 0x2019 -> 0x92, 0x201C -> 0x93,
      0x201D -> 0x94, 0x2022 -> 0x95, 0x2013 -> 0x96, 0x2014 -> 0x97,
      0x02DC -> 0x98, 0x2122 -> 0x99, 0x0161 -> 0x9A, 0x203A -> 0x9B,
      0x0153 -> 0x9C, 0x017E -> 0x9E, 0x0178 -> 0x9F)
    val m = new java.util.HashMap[Character, java.lang.Byte](64)
    pairs.foreach { case (c, b) => m.put(c.toChar, b.toByte) }
    m
  }

  def repair(s: UTF8String): UTF8String = {
    var cur = s.toString
    var rounds = 0
    var changed = false
    while (rounds < 3) {
      val fixed = repairOnce(cur)
      if (fixed == null) {
        return if (changed) UTF8String.fromString(cur) else s
      }
      cur = fixed
      changed = true
      rounds += 1
    }
    UTF8String.fromString(cur)
  }

  /** One round; null = not mojibake (leave as-is). */
  private def repairOnce(str: String): String = {
    val n = str.length
    val bytes = new Array[Byte](n)
    var i = 0
    var hasHigh = false
    while (i < n) {
      val c = str.charAt(i)
      if (c < 0x80) bytes(i) = c.toByte
      else if (c <= 0xFF) { bytes(i) = c.toByte; hasHigh = true }
      else {
        val b = cp1252Rev.get(c)
        if (b == null) return null
        bytes(i) = b.byteValue()
        hasHigh = true
      }
      i += 1
    }
    if (!hasHigh) return null
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      // a genuine repair consumes at least one multi-byte sequence
      if (out.length < n) out else null
    } catch {
      case _: CharacterCodingException => null
    }
  }
}
