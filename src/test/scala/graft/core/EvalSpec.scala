package graft.core

import graft.ops.EvalOps
import org.apache.spark.sql.Row

/** Hand-computed ROUGE/BLEU cases (the RoundTenBSpec closed-form
  * discipline): tiny corpora where the clipped-overlap arithmetic is
  * checkable on paper.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))

  test("rouge: clipped counts, micro F1") {
    // pair 0: ref(0)="the cat sat", cand(1)="the cat the"
    // uni: ov=min(2,1)[the]+1[cat]=2, c1=3, r1=3 -> p=r=2/3, f=4/6
    // bi:  cand {the cat, cat the} vs ref {the cat, cat sat} -> ov=1/2
    val r = EvalOps.rouge(docs(0L -> "The cat sat", 1L -> "the CAT the"),
      "doc_id", "text", "source").collect()
    assert(r.length == 1)
    val Row(_, n, p1, r1, f1, p2, r2, f2) = r.head
    assert(n == 1L)
    assert(p1 == 0.666667 && r1 == 0.666667 && f1 == 0.666667)
    assert(p2 == 0.5 && r2 == 0.5 && f2 == 0.5)
  }

  test("rouge: disjoint pair scores zero; incomplete pair dropped") {
    val r = EvalOps.rouge(
      docs(0L -> "aa bb", 1L -> "cc dd", 4L -> "orphan ref"),
      "doc_id", "text", "source").collect()
    val Row(_, n, p1, _, _, _, _, f2) = r.head
    assert(n == 1L) // doc 4 has no candidate partner
    assert(p1 == 0.0 && f2 == 0.0)
  }

  test("bleu2: geometric mean and brevity penalty") {
    // same pair as above: p1=2/3, p2=1/2, |cand|=|ref| -> bp=1,
    // bleu = sqrt(1/3) = 0.577350
    val b = EvalOps.bleu2(docs(0L -> "the cat sat", 1L -> "the cat the"),
      "doc_id", "text", "source").collect()
    val Row(_, _, p1, p2, bp, bleu) = b.head
    assert(p1 == 0.666667 && p2 == 0.5 && bp == 1.0)
    assert(bleu == 0.57735)
    // short candidate: cand 1 token vs ref 3 -> bp = exp(1-3) = e^-2
    val s = EvalOps.bleu2(docs(0L -> "a b c", 1L -> "a"),
      "doc_id", "text", "source").collect()
    val Row(_, _, _, _, bp2, bleu2) = s.head
    assert(bp2 == math.rint(math.exp(-2.0) * 1e6) / 1e6)
    assert(bleu2 == 0.0) // no candidate bigram -> ov2 = 0 -> zero
  }
}
