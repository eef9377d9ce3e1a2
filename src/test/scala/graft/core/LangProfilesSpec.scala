package graft.core

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.ops.{LangNgram, LangProfiles}

class LangProfilesSpec extends SparkSpec {
  import spark.implicits._

  test("derive on LangNgram's seeds reproduces its compile-time weights exactly") {
    val m = LangProfiles.derive(LangNgram.langs, LangNgram.seeds)
    assert(m.langs == LangNgram.langs.toIndexedSeq)
    assert(m.triFloors.toSeq == LangNgram.floors.toSeq)
    assert(m.uniFloor == LangNgram.sharedUniFloor)
    assert(m.tri.asScala.map { case (k, v) => k -> v.toSeq } ==
      LangNgram.merged.asScala.map { case (k, v) => k -> v.toSeq })
    assert(m.uni.asScala.map { case (k, v) => k -> v.toSeq } ==
      LangNgram.mergedUni.asScala.map { case (k, v) => k -> v.toSeq })
  }

  test("profile table round trip is lossless (digest-equal model)") {
    val m = LangProfiles.wideModel
    val rt = LangProfiles.fromTable(LangProfiles.toTable(spark, m))
    assert(rt.langs == m.langs)
    assert(rt.digest == m.digest)
  }

  test("loaded 5-language model scores identically to the static q96 path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = LangProfiles.fromTable(LangProfiles.toTable(spark,
      LangProfiles.derive(LangNgram.langs, LangNgram.seeds)))
    val loaded = LangProfiles.score(docs, "doc_id", "text", m)
      .select(col("id"), col("s_en"), col("s_zh"), col("lang_pred"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    graft.functions.GraftFunctions.register(spark)
    val static0 = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.call_function("graft_lang_scores",
          coalesce(col("text"), lit(""))).as("sc"))
      .select(col("doc_id"), element_at(col("sc"), 1).as("s_en"),
        element_at(col("sc"), 5).as("s_zh"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(loaded.map(t => (t._1, t._2, t._3)) == static0)
  }

  test("wide model identifies the five added languages") {
    val samples = Seq(
      (1L, "it", "il diritto alla libertà e alla sicurezza della persona è di tutti gli individui"),
      (2L, "pt", "toda a pessoa tem direito à liberdade e à segurança e ninguém será mantido em servidão"),
      (3L, "nl", "een ieder heeft recht op vrijheid van gedachte en niemand zal in slavernij gehouden worden"),
      (4L, "ru", "каждый человек имеет право на свободу мысли и никто не должен содержаться в рабстве"),
      (5L, "ja", "すべての人は思想の自由に対する権利を有する 何人も奴隷にされることはない"))
    val m = LangProfiles.fromTable(
      LangProfiles.toTable(spark, LangProfiles.wideModel))
    val got = LangProfiles.score(
        samples.map(t => (t._1, t._3)).toDF("doc_id", "text"),
        "doc_id", "text", m)
      .select("id", "lang_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    samples.foreach { case (id, want, _) =>
      assert(got(id) == want, s"doc $id: predicted ${got(id)}, want $want")
    }
  }

  test("model registry is bounded: re-scoring the same model reuses its entry") {
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    val m = LangProfiles.wideModel
    for (_ <- 1 to 5)
      LangProfiles.score(docs, "doc_id", "text", m).count()
    // digest keying: 5 invocations, one registry entry for this model
    assert(m.digest == LangProfiles.fromTable(
      LangProfiles.toTable(spark, m)).digest)
  }
}
