package graft.core

import org.apache.spark.sql.functions._
import graft.ops.LangNgram

class LangNgramSpec extends SparkSpec {

  test("each seed text classifies as its own language") {
    LangNgram.langs.foreach { l =>
      val pred = LangNgram.predict(LangNgram.scores(LangNgram.seeds(l)))
      assert(pred == l, s"seed $l predicted $pred")
    }
  }

  test("held-out sentences classify correctly") {
    val held = Seq(
      "en" -> "The weather report said that it would rain for most of the week.",
      "de" -> "Die Kinder spielen nach der Schule gerne im Garten hinter dem Haus.",
      "fr" -> "Les enfants aiment jouer dans le jardin après une longue journée.",
      "es" -> "Los estudiantes leen muchos libros durante las vacaciones de verano.",
      "zh" -> "学生们在暑假期间阅读了许多有趣的书籍和杂志")
    held.foreach { case (l, s) =>
      val pred = LangNgram.predict(LangNgram.scores(s))
      assert(pred == l, s"held-out $l predicted $pred: $s")
    }
  }

  test("expression matches the kernel on corpus + edge cases") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
      .union(Seq((9001L, ""), (9002L, "ab"), (9003L, "   \t\n  "),
        (9004L, "Würde égaux 平等"), (9005L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val got = docs.select($"doc_id",
      call_function("graft_lang_scores", coalesce($"text", lit(""))).as("sc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    docs.collect().foreach { r =>
      val id = r.getLong(0)
      val txt = Option(r.getString(1)).getOrElse("")
      assert(got(id).sameElements(LangNgram.scores(txt)), s"doc $id diverged")
    }
  }

  test("short/empty text scores zero and predicts the tie-break head") {
    assert(LangNgram.scores("").forall(_ == 0))
    assert(LangNgram.scores("ab").forall(_ == 0))
    assert(LangNgram.predict(LangNgram.scores("")) == LangNgram.langs.head)
  }

  test("profiles are within bounds and floors are below kept weights") {
    LangNgram.profiles.foreach { case (l, p, floor) =>
      assert(p.size <= LangNgram.TopK, s"$l profile too big")
      assert(p.nonEmpty, s"$l profile empty")
      assert(p.values.forall(_ > floor), s"$l has weight <= floor")
      assert(p.keys.forall(_.length == 3), s"$l has non-trigram key")
    }
  }
}
