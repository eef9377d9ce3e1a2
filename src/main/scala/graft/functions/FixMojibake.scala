package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair: `graft_fix_mojibake(text)` — undoes the classic
  * crawl-corpus encoding accident where UTF-8 bytes were decoded as
  * windows-1252 ("cafÃ©" → "café", "â€”" → "—"). Spark has no
  * built-in for a byte-level recode, and a replace-table can never be
  * complete — the correct inverse is the actual codec pair.
  *
  * Contract — STRICT ROUND-TRIP OR UNTOUCHED:
  *  1. cheap heuristic gate: the UTF-8 lead bytes 0xC2/0xC3/0xE2/0xC5
  *     read as cp1252 are Â/Ã/â/Å; a string containing none of them
  *     is returned as-is (the overwhelmingly common path — one scan,
  *     no allocation).
  *  2. re-encode the WHOLE string to windows-1252. Codepoints cp1252
  *     cannot express abort the repair — so CJK, emoji, or
  *     already-correct text mixing with a stray Ã never gets mangled.
  *     U+0080–U+009F C1 controls encode as their byte value: HTML5-
  *     and Python-style cp1252 decoders map the five undefined bytes
  *     (0x81 8D 8F 90 9D) there, and their mojibake is repairable;
  *     Java's own decoder maps them to U+FFFD, which correctly aborts
  *     (the byte is gone — altering the text would fabricate data).
  *  3. strictly decode those bytes as UTF-8. Any malformed sequence
  *     aborts → original input ("São Paulo" survives: 0xC3 'o' is not
  *     valid UTF-8, so legitimate Ã is never "repaired").
  *
  * One pass repairs one decode accident; doubly-mojibaked text fixes
  * to singly-mojibaked (callers can iterate to a fixpoint — the gate
  * makes the second pass cheap). Deterministic: pure byte mapping,
  * no locale, no JVM variance (cp1252 is a fixed table).
  */
case class FixMojibake(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_fix_mojibake"
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    FixMojibake.repair(s) match {
      case null => input
      case fixed => UTF8String.fromString(fixed)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-span variant: `graft_fix_mojibake_spans(text)` — see
  * [[FixMojibake.repairSpans]]. Use for corpora that mix scripts;
  * the whole-string form is the conservative default.
  */
case class FixMojibakeSpans(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_fix_mojibake_spans"
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    FixMojibake.repairSpans(s) match {
      case null => input
      case fixed => UTF8String.fromString(fixed)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FixMojibake {
  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  /** codepoint → cp1252 byte, or -1 if not representable. Built once
    * from the JDK's own table (bytes 0x00–0xFF decoded), then the C1
    * passthrough patched in.
    */
  private val Reverse: java.util.HashMap[Int, Int] = {
    val m = new java.util.HashMap[Int, Int](512)
    val all = new Array[Byte](256)
    var i = 0; while (i < 256) { all(i) = i.toByte; i += 1 }
    val decoded = new String(all, Cp1252)
    i = 0
    decoded.codePoints().toArray.zipWithIndex.foreach { case (cp, b) =>
      if (cp != 0xFFFD) m.put(cp, b)
    }
    // undefined-byte passthrough: U+0081 &c encode as their own value
    Seq(0x81, 0x8D, 0x8F, 0x90, 0x9D).foreach(b => m.put(b, b))
    m
  }

  /** Per-SPAN repair for mixed documents: one mojibake paragraph in a
    * CJK (or emoji-bearing) document is the common real case, and
    * whole-string strictness correctly refuses it. Here the text is
    * split into maximal runs of cp1252-encodable codepoints (a
    * mojibake sequence is by construction entirely cp1252 chars, so a
    * non-encodable boundary can never cut one); each run containing a
    * heuristic gate char gets the same strict round-trip-or-untouched
    * attempt, independently. Returns null when nothing changed.
    *
    * Per-run strictness keeps the safety argument intact: "SÃO PAULO"
    * inside a CJK document still refuses (its run is not valid
    * UTF-8), destroyed bytes still refuse, and runs without gate
    * chars are never touched.
    */
  def repairSpans(s: String): String = {
    var changed = false
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      // collect a maximal cp1252-encodable run
      val start = i
      var hasGate = false
      while (i < s.length && {
        val cp = s.codePointAt(i)
        cp < 0x80 || Reverse.containsKey(cp)
      }) {
        val c = s.charAt(i)
        if (c == 'Â' || c == 'Ã' || c == 'â' || c == 'Å') hasGate = true
        i += Character.charCount(s.codePointAt(i))
      }
      if (i > start) {
        val run = s.substring(start, i)
        val fixed = if (hasGate) repair(run) else null
        if (fixed != null) { sb.append(fixed); changed = true }
        else sb.append(run)
      }
      // copy the non-encodable stretch verbatim
      while (i < s.length && {
        val cp = s.codePointAt(i)
        !(cp < 0x80 || Reverse.containsKey(cp))
      }) {
        val n = Character.charCount(s.codePointAt(i))
        sb.append(s, i, i + n)
        i += n
      }
    }
    if (changed) sb.toString else null
  }

  /** Repaired string, or null when the input is not (whole-string,
    * strictly) repairable.
    */
  def repair(s: String): String = {
    // heuristic gate: mojibake from UTF-8 lead bytes is Â Ã â Å (the
    // cp1252 reads of 0xC2 0xC3 0xE2 0xC5, covering Latin-1
    // accents, general punctuation, and œ/Œ)
    var seen = false
    var i = 0
    while (i < s.length && !seen) {
      val c = s.charAt(i)
      seen = c == 'Â' || c == 'Ã' || c == 'â' || c == 'Å'
      i += 1
    }
    if (!seen) return null
    val out = new Array[Byte](s.length)
    var n = 0
    i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 0x80) out(n) = cp.toByte
      else {
        val b = Reverse.getOrDefault(cp, -1)
        if (b < 0) return null // not cp1252-expressible: abort, untouched
        out(n) = b.toByte
      }
      n += 1
      i += Character.charCount(cp)
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val fixed = dec.decode(java.nio.ByteBuffer.wrap(out, 0, n)).toString
      if (fixed == s) null else fixed
    } catch {
      case _: java.nio.charset.CharacterCodingException => null
    }
  }
}
