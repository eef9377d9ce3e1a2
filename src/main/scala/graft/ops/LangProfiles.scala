package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DATA-DRIVEN profile-table language-ID — the model-as-a-dataset twin
  * of [[LangNgram]] (whose 5 profiles are frozen at compile time from
  * its seed texts). Real curation pipelines need 50–100+ languages and
  * model swaps without recompiling, so here the profile set is a plain
  * DataFrame in a documented long format: derive it from any seed
  * corpus ([[derive]] → [[toTable]]), persist it like any table, load
  * it back ([[fromTable]]), and score with the identical kernel. The
  * static path stays the fast compile-time twin — [[derive]] on
  * [[LangNgram.seeds]] reproduces its weights bit-for-bit
  * (spec-pinned).
  *
  * Scale shape unchanged from LangNgram: a language model is
  * vocabulary-bounded (topK trigrams × languages — kilobytes to a few
  * MB), the same broadcast-model discipline as the BPE merge table, so
  * scoring stays a zero-shuffle scan: the model rides to executors
  * inside the scoring expression (the stage's task binary is broadcast
  * once), never as a join against the corpus.
  *
  * Profile-table format (one self-contained DataFrame):
  * {{{
  *   family  | gram  | lang  | weight
  *   "lang"  | <l>   | null  | <ordinal>       -- language order (ties/argmax)
  *   "tri"   | <g>   | <l>   | <w>             -- kept trigram weights
  *   "tri_floor" | null | <l> | <floor>        -- per-language OOV floor
  *   "uni"   | <ch>  | <l>   | <w>             -- non-ASCII unigram weights
  *   "uni_floor" | null | null | <floor>       -- shared unigram floor
  * }}}
  *
  * Reference: laccore/feldman has no language-ID; this is LLM-pipeline
  * surface (Cavnar–Trenkle / langid.py family, see LangNgram).
  */
object LangProfiles {

  /** A loaded scoring model. Maps are plain JVM hash maps — the
    * expression holds the instance and Spark broadcasts it with the
    * task binary.
    */
  final case class LangModel(
      langs: IndexedSeq[String],
      tri: java.util.HashMap[String, Array[Long]],
      triFloors: Array[Long],
      uni: java.util.HashMap[Character, Array[Long]],
      uniFloor: Long) {

    /** Same kernel as [[LangNgram.scores]], over this model. */
    def scores(raw: String): Array[Long] = {
      val s = LangNgram.normalize(raw)
      val out = new Array[Long](langs.size)
      var i = 0
      while (i <= s.length - 3) {
        val w = tri.get(s.substring(i, i + 3))
        if (w == null) {
          var j = 0
          while (j < out.length) { out(j) += triFloors(j); j += 1 }
        } else {
          var j = 0
          while (j < out.length) { out(j) += w(j); j += 1 }
        }
        i += 1
      }
      i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c > 127) {
          val w = uni.get(c)
          var j = 0
          if (w == null)
            while (j < out.length) { out(j) += uniFloor; j += 1 }
          else
            while (j < out.length) { out(j) += w(j); j += 1 }
        }
        i += 1
      }
      out
    }

    /** Content digest — the model registry key (same model → same
      * key, so repeated scoring never grows the registry).
      */
    lazy val digest: String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      def put(s: String): Unit = md.update(s.getBytes("UTF-8"))
      langs.foreach(put)
      import scala.jdk.CollectionConverters._
      tri.asScala.toSeq.sortBy(_._1).foreach { case (g, ws) =>
        put(g); put(ws.mkString(",")) }
      put(triFloors.mkString(","))
      uni.asScala.toSeq.sortBy(_._1).foreach { case (c, ws) =>
        put(c.toString); put(ws.mkString(",")) }
      put(uniFloor.toString)
      md.digest().map("%02x".format(_)).mkString
    }
  }

  /** Derive a model from seed texts — the SAME math as LangNgram's
    * compile-time derivation (shared smoothing vocabulary, pooled
    * shared floors, add-one smoothing, topK kept trigrams), with the
    * language set as data. `langs` order is the tie-break order.
    */
  def derive(langs: Seq[String], seeds: Map[String, String],
      topK: Int = LangNgram.TopK): LangModel = {
    require(langs.nonEmpty && langs.forall(seeds.contains),
      s"every language needs a seed text; got langs=$langs seeds=${seeds.keys}")
    def trigrams(s: String): Iterator[String] =
      if (s.length < 3) Iterator.empty
      else (0 to s.length - 3).iterator.map(i => s.substring(i, i + 3))
    val norm = langs.map(l => l -> LangNgram.normalize(seeds(l))).toMap
    val unionVocabSize =
      langs.flatMap(l => trigrams(norm(l))).distinct.size
    val totalAll = langs.map(l => trigrams(norm(l)).size).sum
    val sharedFloor =
      math.round(1000.0 * math.log(1.0 / (totalAll + unionVocabSize)))
    val profiles = langs.map { l =>
      val tris = trigrams(norm(l)).toSeq
      val counts = tris.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
      val denom = (tris.size + unionVocabSize).toDouble
      counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(topK)
        .map { case (t, c) => t -> math.round(1000.0 * math.log((c + 1) / denom)) }
        .toMap
    }
    val tri = new java.util.HashMap[String, Array[Long]]()
    profiles.flatMap(_.keys).distinct.foreach { t =>
      tri.put(t, profiles.map(_.getOrElse(t, sharedFloor)).toArray)
    }
    val uniVocab = langs.flatMap(l => norm(l).filter(_ > 127)).distinct.sorted
    val totalAllUni = langs.map(l => norm(l).count(_ > 127)).sum
    val uniFloor =
      math.round(1000.0 * math.log(1.0 / (totalAllUni + uniVocab.size)))
    val uniProfiles = langs.map { l =>
      val chars = norm(l).filter(_ > 127)
      val counts = chars.groupBy(identity).map { case (c, g) => c -> g.length.toLong }
      val denom = (chars.length + uniVocab.size).toDouble
      counts.map { case (c, n) =>
        c -> math.round(1000.0 * math.log((n + 1) / denom)) }
    }
    val uni = new java.util.HashMap[Character, Array[Long]]()
    uniVocab.foreach { c =>
      uni.put(c, uniProfiles.map(_.getOrElse(c, uniFloor)).toArray)
    }
    LangModel(langs.toIndexedSeq, tri,
      Array.fill(langs.size)(sharedFloor), uni, uniFloor)
  }

  val TableSchema: StructType = StructType(Seq(
    StructField("family", StringType, nullable = false),
    StructField("gram", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("weight", LongType, nullable = false)))

  /** Model → profile-table DataFrame (the persistable artifact). */
  def toTable(spark: SparkSession, m: LangModel): DataFrame = {
    import scala.jdk.CollectionConverters._
    val langIdx = m.langs.zipWithIndex.toMap
    val rows =
      m.langs.zipWithIndex.map { case (l, i) =>
        Row("lang", l, null, i.toLong) } ++
      m.tri.asScala.toSeq.sortBy(_._1).flatMap { case (g, ws) =>
        // store only REAL profile entries; floor fills reconstruct
        m.langs.indices.collect {
          case i if ws(i) != m.triFloors(i) => Row("tri", g, m.langs(i), ws(i))
        }
      } ++
      m.langs.indices.map(i =>
        Row("tri_floor", null, m.langs(i), m.triFloors(i))) ++
      m.uni.asScala.toSeq.sortBy(_._1).flatMap { case (c, ws) =>
        m.langs.indices.collect {
          case i if ws(i) != m.uniFloor => Row("uni", c.toString, m.langs(i), ws(i))
        }
      } ++
      Seq(Row("uni_floor", null, null, m.uniFloor))
    spark.createDataFrame(rows.asJava, TableSchema)
  }

  /** Profile-table DataFrame → model. The table is vocabulary-bounded
    * by construction (a model, not data), so the collect is the same
    * driver-bounded control-table pattern as the BPE merge table.
    */
  def fromTable(df: DataFrame): LangModel = {
    val rows = df.select("family", "gram", "lang", "weight").collect()
    def fam(f: String) = rows.filter(_.getString(0) == f)
    val langs = fam("lang").sortBy(_.getLong(3)).map(_.getString(1)).toIndexedSeq
    require(langs.nonEmpty, "profile table has no 'lang' rows")
    val idx = langs.zipWithIndex.toMap
    val triFloorByLang = fam("tri_floor")
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    require(langs.forall(triFloorByLang.contains),
      s"missing tri_floor for ${langs.filterNot(triFloorByLang.contains)}")
    val triFloors = langs.map(triFloorByLang).toArray
    val uniFloor = fam("uni_floor") match {
      case Array(r) => r.getLong(3)
      case other => sys.error(s"expected exactly one uni_floor row, got ${other.length}")
    }
    val tri = new java.util.HashMap[String, Array[Long]]()
    fam("tri").groupBy(_.getString(1)).foreach { case (g, rs) =>
      val ws = triFloors.clone()
      rs.foreach(r => ws(idx(r.getString(2))) = r.getLong(3))
      tri.put(g, ws)
    }
    val uni = new java.util.HashMap[Character, Array[Long]]()
    fam("uni").groupBy(_.getString(1)).foreach { case (g, rs) =>
      require(g.length == 1, s"uni gram must be one char, got '$g'")
      val ws = Array.fill(langs.size)(uniFloor)
      rs.foreach(r => ws(idx(r.getString(2))) = r.getLong(3))
      uni.put(g.charAt(0), ws)
    }
    LangModel(langs, tri, triFloors, uni, uniFloor)
  }

  /** name → model for the expression builder (same pattern as
    * DropGuard's accumulator registry); keyed by content digest, so
    * the registry is bounded by DISTINCT models ever scored in the
    * JVM — re-scoring with the same model reuses its entry.
    */
  private val models = new ConcurrentHashMap[String, LangModel]()

  private[graft] def modelFor(key: String): LangModel = {
    val m = models.get(key)
    require(m != null, s"graft_lang_model_scores: unknown model '$key' — " +
      "score through LangProfiles.score")
    m
  }

  /** Score every document against a loaded model: one zero-shuffle
    * scan projection, columns (id, s_<lang>..., lang_pred). The exact
    * twin of the q96 static projection when `m` derives from
    * [[LangNgram.seeds]].
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      m: LangModel): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    models.putIfAbsent(m.digest, m)
    val scored = docs.select(col(idCol).as("id"),
      call_function("graft_lang_model_scores",
        lit(m.digest), coalesce(col(textCol), lit(""))).as("_sc"))
      .select(col("id") +: m.langs.zipWithIndex.map { case (l, i) =>
        element_at(col("_sc"), i + 1).as(s"s_$l")
      }: _*)
    val pred = m.langs.zipWithIndex.foldRight(lit(m.langs.last)) {
      case ((l, i), rest) =>
        val laters = m.langs.drop(i + 1).map(o => col(s"s_$l") >= col(s"s_$o"))
        if (laters.isEmpty) rest
        else when(laters.reduce(_ && _), lit(l)).otherwise(rest)
    }
    scored.withColumn("lang_pred", pred)
  }

  /** The shipped wider frozen profile set: [[LangNgram.seeds]] plus
    * five more languages, same public-domain UDHR-derived seed style
    * (it/pt/nl lean on trigrams; ru/ja on the non-ASCII unigram
    * family, like zh). Frozen: editing a seed is a model bump — it
    * shifts q102's oracle.
    */
  val wideLangs: Seq[String] =
    LangNgram.langs ++ Seq("it", "pt", "nl", "ru", "ja")

  val wideSeeds: Map[String, String] = LangNgram.seeds ++ Map(
    "it" -> ("Tutti gli esseri umani nascono liberi ed eguali in dignità " +
      "e diritti. Essi sono dotati di ragione e di coscienza e devono " +
      "agire gli uni verso gli altri in spirito di fratellanza. Ogni " +
      "individuo ha diritto alla vita alla libertà e alla sicurezza " +
      "della propria persona. Nessun individuo potrà essere tenuto in " +
      "stato di schiavitù o di servitù. Ogni individuo ha diritto alla " +
      "libertà di pensiero di coscienza e di religione. Tutti sono " +
      "eguali dinanzi alla legge e hanno diritto senza alcuna " +
      "discriminazione ad una eguale tutela da parte della legge."),
    "pt" -> ("Todos os seres humanos nascem livres e iguais em dignidade " +
      "e em direitos. Dotados de razão e de consciência devem agir uns " +
      "para com os outros em espírito de fraternidade. Todo indivíduo " +
      "tem direito à vida à liberdade e à segurança pessoal. Ninguém " +
      "será mantido em escravidão ou em servidão. Toda a pessoa tem " +
      "direito à liberdade de pensamento de consciência e de religião. " +
      "Todos são iguais perante a lei e sem distinção têm direito a " +
      "igual proteção da lei."),
    "nl" -> ("Alle mensen worden vrij en gelijk in waardigheid en rechten " +
      "geboren. Zij zijn begiftigd met verstand en geweten en behoren " +
      "zich jegens elkander in een geest van broederschap te gedragen. " +
      "Een ieder heeft recht op leven vrijheid en onschendbaarheid van " +
      "zijn persoon. Niemand zal in slavernij of horigheid gehouden " +
      "worden. Een ieder heeft recht op vrijheid van gedachte geweten " +
      "en godsdienst. Allen zijn gelijk voor de wet en hebben zonder " +
      "onderscheid aanspraak op gelijke bescherming door de wet."),
    "ru" -> ("Все люди рождаются свободными и равными в своем " +
      "достоинстве и правах. Они наделены разумом и совестью и должны " +
      "поступать в отношении друг друга в духе братства. Каждый " +
      "человек имеет право на жизнь на свободу и на личную " +
      "неприкосновенность. Никто не должен содержаться в рабстве или " +
      "в подневольном состоянии. Каждый человек имеет право на свободу " +
      "мысли совести и религии. Все люди равны перед законом и имеют " +
      "право без всякого различия на равную защиту закона."),
    "ja" -> ("すべての人間は 生まれながらにして自由であり かつ 尊厳と権利と " +
      "について平等である 人間は 理性と良心とを授けられており 互いに同胞の " +
      "精神をもって行動しなければならない すべての人は 生命 自由及び身体の " +
      "安全に対する権利を有する 何人も 奴隷にされ又は苦役に服することはない " +
      "すべての人は 思想 良心及び宗教の自由に対する権利を有する すべての人は " +
      "法の下において平等であり いかなる差別もなしに法の平等な保護を受ける " +
      "権利を有する"))

  /** The shipped wide model (derived once per JVM — still "loaded":
    * q102 routes it through [[toTable]] → [[fromTable]]).
    */
  lazy val wideModel: LangModel = derive(wideLangs, wideSeeds)
}
