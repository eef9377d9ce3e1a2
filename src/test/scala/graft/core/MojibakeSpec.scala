package graft.core

import graft.functions.FixMojibake
import graft.ops.TextOps
import org.apache.spark.sql.functions._
import java.nio.charset.{Charset, StandardCharsets}

/** Strict mojibake repair (graft_fix_mojibake, q114). */
class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  private val cp1252 = Charset.forName("windows-1252")

  /** Manufacture Java-style mojibake: UTF-8 bytes misread as cp1252
    * (undefined bytes become U+FFFD, as Java's decoder does).
    */
  private def javaMoji(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), cp1252)

  /** HTML5/Python-style mojibake: undefined cp1252 bytes pass through
    * as C1 controls instead of U+FFFD.
    */
  private def html5Moji(s: String): String = {
    val undef = Set(0x81, 0x8D, 0x8F, 0x90, 0x9D)
    s.getBytes(StandardCharsets.UTF_8).map { b =>
      val u = b & 0xFF
      if (undef(u)) u.toChar.toString else new String(Array(b), cp1252)
    }.mkString
  }

  test("round-trip: corrupt then repair restores the original") {
    val originals = Seq(
      "café — naïve résumé", "Weiß über größer", "œuvre and Œdipe",
      "punctuation: “fancy” … – — ‘single’ €99", "señor año jalapeño",
      "àâäçèéêëîïôùûü mixed with plain ascii")
    originals.foreach { o =>
      val m = html5Moji(o)
      assert(m != o, s"corruption must change: $o")
      assert(FixMojibake.repair(m) == o, s"repair failed for: $o -> $m")
    }
  }

  test("java-decoder mojibake repairs when no byte was destroyed") {
    val safe = "café — naïve" // no utf-8 byte lands on an undefined cp1252 slot
    assert(FixMojibake.repair(javaMoji(safe)) == safe)
    // ” is E2 80 9D; 0x9D is undefined -> U+FFFD -> information gone
    val destroyed = javaMoji("a “quoted” word")
    assert(destroyed.contains('�'))
    assert(FixMojibake.repair(destroyed) == null,
      "destroyed bytes must refuse repair, not fabricate text")
  }

  test("legitimate text is never mangled") {
    // Ã before ASCII is not valid UTF-8 — the classic counterexample
    assert(FixMojibake.repair("São Paulo") == null)
    // CJK cannot re-encode to cp1252: whole-string strictness protects
    // mixed documents even when a true mojibake span is present
    assert(FixMojibake.repair("日本語 plus cafÃ©") == null)
    assert(FixMojibake.repair("plain ascii") == null)
    assert(FixMojibake.repair("déjà vu — already correct") == null)
  }

  test("repair is idempotent on its own output") {
    val m = html5Moji("café “done” …")
    val once = FixMojibake.repair(m)
    assert(once != null)
    assert(FixMojibake.repair(once) == null, "second pass must be a no-op")
  }

  test("double mojibake peels one layer per pass") {
    val orig = "café"
    val twice = html5Moji(html5Moji(orig))
    val once = FixMojibake.repair(twice)
    assert(once == html5Moji(orig))
    assert(FixMojibake.repair(once) == orig)
  }

  test("repairSpans: fixes the bad run, keeps mixed-script context") {
    val moji = javaMoji("café")
    // CJK context refuses whole-string repair but span repair works
    assert(FixMojibake.repair(s"日本語 $moji text") == null)
    assert(FixMojibake.repairSpans(s"日本語 $moji text") == "日本語 café text")
    // emoji (astral, not cp1252) likewise breaks the run, not the fix
    assert(FixMojibake.repairSpans(s"ok 😀 $moji") == "ok 😀 café")
    // a run poisoned by an invalid sequence stays whole-run untouched
    val poisoned = s"移動 SÃO PAULO ${javaMoji("—")}dash"
    assert(FixMojibake.repairSpans(poisoned) == null,
      "invalid sequence must hold its whole run back")
    // no gate chars, no change
    assert(FixMojibake.repairSpans("日本語 plain ascii") == null)
    // idempotent on its own output
    val once = FixMojibake.repairSpans(s"日本語 $moji")
    assert(once != null && FixMojibake.repairSpans(once) == null)
  }

  test("dataframe surface: detection counts and strict repair") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (1L, javaMoji("café")), (2L, "SÃO PAULO"), (3L, "clean text"))
      .toDF("id", "t")
      .select(col("id"), TextOps.mojibakeCount(col("t")).as("n"),
        TextOps.fixMojibake(col("t")).as("fixed"), col("t"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getString(2), r.getString(3)))).toMap
    assert(df(1)._1 >= 1 && df(1)._2 == "café")
    assert(df(2)._1 >= 1 && df(2)._2 == "SÃO PAULO", "detected but untouched")
    assert(df(3)._1 == 0 && df(3)._2 == "clean text")
  }
}
