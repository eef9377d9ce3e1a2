package graft.ops

/** Character-n-gram language identification (the Cavnar–Trenkle /
  * langid.py family, profile-scored as naive Bayes): each language has
  * a frozen profile of its most frequent character TRIGRAMS with
  * integer-scaled log-probability weights; a document's score for a
  * language is the sum of its trigram weights (out-of-profile
  * trigrams pay that language's floor penalty), and the prediction is
  * the argmax. This is the standard upgrade over the marker-word
  * heuristic in [[TextOps.langPredict]] (kept as the cheap twin —
  * reference: laccore/feldman has no language-ID at all; both
  * operators are LLM-pipeline surface).
  *
  * Determinism contract (what makes q96 oracle-able):
  *  - profiles derive from FIXED seed texts in pure sequential Scala
  *    at class-init — no RNG, no corpus dependence, no Spark;
  *  - weights are integers (round(1000·ln p)); integer addition is
  *    associative, so any aggregation order — Spark's sequential
  *    per-row loop, DuckDB's grouped sum — produces the identical
  *    score, unlike a double log-prob sum;
  *  - normalization (lowercase, whitespace-run → single space, trim)
  *    and position-wise trigram extraction are replayed verbatim by
  *    the DuckDB oracle; both engines see ASCII corpus text, so Java
  *    UTF-16 chars and DuckDB codepoints index identically.
  *
  * Scale shape: scoring is ONE pass over the text per row inside a
  * native expression ([[graft.functions.LangNgramScores]]) with a
  * static hash-map lookup per position — zero shuffles, zero joins;
  * 100 TB of language-ID is a scan. The profile (~1k entries) is
  * JVM-static, not broadcast per query.
  */
object LangNgram {

  /** Prediction tie-break order (earlier wins on equal scores). */
  val langs: Seq[String] = Seq("en", "de", "fr", "es", "zh")

  /** Trigrams kept per language profile. */
  val TopK = 200

  /** Fixed public-domain seed text (UDHR articles) per language —
    * enough mass for stable function-word trigrams ("the", "der",
    * "les", "los"). Frozen: changing a seed changes every weight and
    * requires re-deriving nothing else (profiles rebuild at init),
    * but DOES shift q96's oracle, so treat edits like a model bump.
    */
  val seeds: Map[String, String] = Map(
    "en" -> ("All human beings are born free and equal in dignity and " +
      "rights. They are endowed with reason and conscience and should " +
      "act towards one another in a spirit of brotherhood. Everyone " +
      "has the right to life liberty and security of person. No one " +
      "shall be held in slavery or servitude. Everyone has the right " +
      "to freedom of thought conscience and religion. All are equal " +
      "before the law and are entitled without any discrimination to " +
      "equal protection of the law."),
    "de" -> ("Alle Menschen sind frei und gleich an Würde und Rechten " +
      "geboren. Sie sind mit Vernunft und Gewissen begabt und sollen " +
      "einander im Geist der Brüderlichkeit begegnen. Jeder hat das " +
      "Recht auf Leben Freiheit und Sicherheit der Person. Niemand " +
      "darf in Sklaverei oder Leibeigenschaft gehalten werden. Jeder " +
      "hat das Recht auf Gedanken Gewissens und Religionsfreiheit. " +
      "Alle Menschen sind vor dem Gesetz gleich und haben ohne " +
      "Unterschied Anspruch auf gleichen Schutz durch das Gesetz."),
    "fr" -> ("Tous les êtres humains naissent libres et égaux en " +
      "dignité et en droits. Ils sont doués de raison et de conscience " +
      "et doivent agir les uns envers les autres dans un esprit de " +
      "fraternité. Tout individu a droit à la vie à la liberté et à " +
      "la sûreté de sa personne. Nul ne sera tenu en esclavage ni en " +
      "servitude. Toute personne a droit à la liberté de pensée de " +
      "conscience et de religion. Tous sont égaux devant la loi et " +
      "ont droit sans distinction à une égale protection de la loi."),
    "es" -> ("Todos los seres humanos nacen libres e iguales en " +
      "dignidad y derechos y dotados como están de razón y conciencia " +
      "deben comportarse fraternalmente los unos con los otros. Todo " +
      "individuo tiene derecho a la vida a la libertad y a la " +
      "seguridad de su persona. Nadie estará sometido a esclavitud ni " +
      "a servidumbre. Toda persona tiene derecho a la libertad de " +
      "pensamiento de conciencia y de religión. Todos son iguales " +
      "ante la ley y tienen sin distinción derecho a igual protección " +
      "de la ley."),
    "zh" -> ("人人生而自由 在尊严和权利上一律平等 他们赋有理性和良心 " +
      "并应以兄弟关系的精神相对待 人人有权享有生命 自由和人身安全 " +
      "任何人不得使为奴隶或奴役 人人有思想 良心和宗教自由的权利 " +
      "法律之前人人平等 并有权享受法律的平等保护 不受任何歧视"))

  /** The normalization BOTH engines replay before trigram extraction.
    *
    * BMP assumption (part of the determinism contract): [[scores]]
    * indexes by Java UTF-16 *chars* while the DuckDB oracle indexes by
    * *codepoints* — identical only while the text stays in the Basic
    * Multilingual Plane. Astral-plane input (emoji, rare CJK
    * extensions) shifts the trigram windows between engines: each
    * astral codepoint is two UTF-16 chars (two window positions here,
    * one in DuckDB). All frozen seeds are BMP, so the MODEL is safe by
    * construction; scoring astral corpus text keeps the kernel
    * deterministic (the spec's reference replays the same char
    * semantics) but is not oracle-comparable. Iterating by codepoint
    * would also double the per-position cost of the hot loop for a
    * case the profiles carry no weights for — documented instead.
    */
  def normalize(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[ \\t\\n\\f\\r]+", " ").trim

  private def trigrams(s: String): Iterator[String] =
    if (s.length < 3) Iterator.empty
    else (0 to s.length - 3).iterator.map(i => s.substring(i, i + 3))

  /** Distinct trigrams across ALL seeds — the SHARED smoothing
    * vocabulary. Smoothing each language against its own vocabulary
    * would hand every document to the language with the smallest
    * seed: a short seed's floor ln(1/small_denom) outranks a long
    * seed's hapax weights, the classic unnormalized-NB corpus-size
    * bias. With a common V, a language only wins by actually matching
    * profile trigrams.
    */
  val unionVocabSize: Int =
    seeds.values.flatMap(s => trigrams(normalize(s))).toSeq.distinct.size

  /** The SHARED unseen-trigram penalty. Each language paying its own
    * floor ln(1/(total_l+V)) re-introduces the small-seed bias
    * through the back door: on mostly-out-of-profile text (domain
    * jargon) every position pays the floor, so the language with the
    * smallest seed out-scores all others without matching anything —
    * the sf0.01 corpus came out 500/500 "zh". With ONE floor for all
    * languages, OOV positions shift every score equally (argmax-
    * neutral) and only real profile hits discriminate; a document
    * with no hits at all ties to the [[langs]] head, the documented
    * default. Pooled-total denominator keeps the floor strictly below
    * every kept weight (2/(total_l+V) > 1/(totalAll+V)).
    */
  val sharedFloor: Long = {
    val totalAll = seeds.values.map(s => trigrams(normalize(s)).size).sum
    math.round(1000.0 * math.log(1.0 / (totalAll + unionVocabSize)))
  }

  /** Per-language (kept trigram → weight, floor): add-one smoothing
    * over the shared vocabulary, weight =
    * round(1000·ln((c+1)/(total_l+V))); the floor is [[sharedFloor]]
    * for every language.
    */
  val profiles: Seq[(String, Map[String, Long], Long)] = langs.map { l =>
    val tris = trigrams(normalize(seeds(l))).toSeq
    val counts = tris.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val denom = (tris.size + unionVocabSize).toDouble
    val kept = counts.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(TopK)
      .map { case (t, c) => t -> math.round(1000.0 * math.log((c + 1) / denom)) }
    (l, kept.toMap, sharedFloor)
  }

  /** Unseen-trigram penalty per language, in [[langs]] order. */
  val floors: Array[Long] = profiles.map(_._3).toArray

  /** Union profile: trigram → weight vector in [[langs]] order
    * (per-language floor where absent from that profile). Static —
    * built once per JVM, shared by every task.
    */
  val merged: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]]()
    val union = profiles.flatMap(_._2.keys).distinct
    union.foreach { t =>
      m.put(t, profiles.zipWithIndex.map { case ((_, p, f), i) =>
        p.getOrElse(t, f)
      }.toArray)
    }
    m
  }

  // -- second feature family: NON-ASCII character unigrams ----------
  // Trigrams alone cannot identify CJK from short seeds: hanzi
  // trigrams are three specific codepoints and essentially never
  // recur in held-out text, so Chinese input degenerates to all-OOV.
  // The standard langid fix is mixed n-gram orders; the minimal
  // principled version for this language set is a unigram family
  // restricted to codepoints > 127 — ASCII letters carry no unigram
  // signal (shared by every Latin language), while hanzi and accented
  // letters are highly discriminative. ASCII-only documents are
  // untouched by this family (zero contribution), so the trigram
  // behavior on the corpus is unchanged.

  /** Distinct non-ASCII chars across all seeds (the family's V). */
  val uniVocab: Seq[Char] =
    seeds.values.flatMap(s => normalize(s).filter(_ > 127)).toSeq.distinct.sorted

  /** Shared unigram floor, pooled like [[sharedFloor]]. */
  val sharedUniFloor: Long = {
    val totalAll = seeds.values.map(s => normalize(s).count(_ > 127)).sum
    math.round(1000.0 * math.log(1.0 / (totalAll + uniVocab.size)))
  }

  /** Per-language non-ASCII char → weight (same add-one form as the
    * trigram family).
    */
  val uniProfiles: Seq[(String, Map[Char, Long])] = langs.map { l =>
    val chars = normalize(seeds(l)).filter(_ > 127)
    val counts = chars.groupBy(identity).map { case (c, g) => c -> g.length.toLong }
    val denom = (chars.length + uniVocab.size).toDouble
    (l, counts.map { case (c, n) =>
      c -> math.round(1000.0 * math.log((n + 1) / denom)) })
  }

  /** Union unigram profile: char → weight vector in [[langs]] order. */
  val mergedUni: java.util.HashMap[Character, Array[Long]] = {
    val m = new java.util.HashMap[Character, Array[Long]]()
    uniVocab.foreach { c =>
      m.put(c, uniProfiles.map { case (_, p) =>
        p.getOrElse(c, sharedUniFloor)
      }.toArray)
    }
    m
  }

  /** Score all languages in one text pass (the expression's kernel —
    * also the spec's reference): trigram family over every position,
    * unigram family over non-ASCII positions. Empty/ASCII-short text
    * scores 0 everywhere.
    */
  def scores(raw: String): Array[Long] = {
    val s = normalize(raw)
    val out = new Array[Long](langs.size)
    var i = 0
    while (i <= s.length - 3) {
      val w = merged.get(s.substring(i, i + 3))
      if (w == null) {
        var j = 0
        while (j < out.length) { out(j) += floors(j); j += 1 }
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
        val w = mergedUni.get(c)
        var j = 0
        if (w == null)
          while (j < out.length) { out(j) += sharedUniFloor; j += 1 }
        else
          while (j < out.length) { out(j) += w(j); j += 1 }
      }
      i += 1
    }
    out
  }

  /** Argmax in [[langs]] order (earlier language wins ties). */
  def predict(scoreVec: Array[Long]): String = {
    var best = 0
    var i = 1
    while (i < scoreVec.length) {
      if (scoreVec(i) > scoreVec(best)) best = i
      i += 1
    }
    langs(best)
  }
}
