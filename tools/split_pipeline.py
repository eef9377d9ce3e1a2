#!/usr/bin/env python3
"""One-shot refactoring aid (r12 verdict ask #7) — APPLIED in r13
(commit 5375a38); kept for provenance of the mechanical split. The
family files have since gained entries directly (q366, q375), so
rerunning this against the current tree would be wrong. Original:
split the 6.6k-LoC
PipelineQueries.scala by operator family, keeping the registration map
thin. Mechanical: shared private helpers move to a package-private
PipelineShared object, each family gets its own object with the
VERBATIM entry text (queries + oracles side by side again), and
PipelineQueries becomes the concatenation. Run with --dry to see the
per-family line budget before writing.
"""
import re, sys, collections

SRC = "src/main/scala/graft/queries/PipelineQueries.scala"
PKG_DIR = "src/main/scala/graft/queries"

IMPORTS = """import graft.Tables
import graft.ops.{BlocklistOps, DedupOps, DsirOps, GraphOps, LmOps, MultimodalOps, PcaOps, PreferenceOps, ProfileOps, RetrievalOps, SampleOps, SelectionOps, SimilarityOps, TextOps, WinnowOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
"""

FAMILIES = [
    ("multimodal", re.compile(r"MultimodalOps|image|audio|video|Pixel|wav|png", re.I)),
    ("dedup", re.compile(r"DedupOps|WinnowOps|WinnowStage|minhash|minHash|simhash|simHash|shingle|dedup|contamin|containment|lsh|Lsh|substr|decontaminate|IndexStore")),
    ("similarity", re.compile(r"SimilarityOps|IvfIndexOps|PcaOps|knn|embedding|centroid|kmeans|cluster|cosine|triplet|mmr")),
    ("text", re.compile(r"LmOps|BpeOps|UnigramOps|DsirOps|TextOps|LangNgram|QualityFit|lang|token|quality|perplex|zipf|fertility|bpe|ngram|mojibake|nfc")),
    ("events", re.compile(r"EventOps|StreamOps|TimeSeriesOps|funnel|session|cdc|sprt|drift|events\"")),
    ("profile", re.compile(r"ProfileOps|ComplianceOps|SampleOps|SelectionOps|PreferenceOps|RetrievalOps|GraphOps|BlocklistOps")),
]

ENTRY_RE = re.compile(r'^    "(q\d+[a-z0-9_]*)" ->')


def split_map(lines, start, end):
    """Return (entries ordered [(key, [lines])], preamble_lines)."""
    entries = []
    pre = []
    cur_key, cur = None, []
    pending_comments = []
    for ln in lines[start:end]:
        m = ENTRY_RE.match(ln)
        if m:
            if cur_key is not None:
                entries.append((cur_key, cur))
            cur_key = m.group(1)
            cur = pending_comments + [ln]
            pending_comments = []
        elif cur_key is None:
            if ln.strip().startswith("//") or ln.strip() == "":
                pending_comments.append(ln)
            else:
                pre.extend(pending_comments)
                pending_comments = []
                pre.append(ln)
        else:
            if ln.strip().startswith("//") or ln.strip() == "":
                # could belong to the NEXT entry; buffer until decided
                pending_comments.append(ln)
            else:
                cur.extend(pending_comments)
                pending_comments = []
                cur.append(ln)
    if cur_key is not None:
        entries.append((cur_key, cur))
    return entries, pre


def classify(key, text, qclass):
    if key in qclass:
        return qclass[key]
    for fam, rx in FAMILIES:
        if rx.search(text):
            return fam
    return "misc"


def with_comma(entry_lines):
    out = list(entry_lines)
    for i in range(len(out) - 1, -1, -1):
        s = out[i].rstrip()
        if s and not s.lstrip().startswith("//"):
            if not s.endswith(","):
                out[i] = s + ",\n"
            return out
    return out


def main():
    dry = "--dry" in sys.argv
    lines = open(SRC).readlines()
    n = len(lines)
    q_start = next(i for i, l in enumerate(lines)
                   if l.startswith("  val queries: Map[String, Q] = Map("))
    o_start = next(i for i, l in enumerate(lines)
                   if l.startswith("  val oracles: Map[String, String] = Map("))
    # map bodies end at the matching top-level ")" line: find last "  )"
    # before the next val / EOF by scanning backwards
    def map_end(start, stop):
        for i in range(stop - 1, start, -1):
            if lines[i].rstrip() == "  )":
                return i
        raise SystemExit(f"no map close found in {start}..{stop}")
    q_end = map_end(q_start, o_start)
    o_end = map_end(o_start, n)

    header = lines[:q_start]
    # helpers living BETWEEN the two maps (componentsCte etc.) join the
    # shared object too
    header = header + lines[q_end + 1:o_start]
    q_entries, q_pre = split_map(lines, q_start + 1, q_end)
    o_entries, o_pre = split_map(lines, o_start + 1, o_end)
    tail = [l for l in lines[o_end + 1:] if l.strip() not in ("}", "")]
    if q_pre and any(s.strip() for s in q_pre):
        print("WARN: queries-map preamble lines:", q_pre[:3])
    if tail:
        raise SystemExit(f"unexpected tail after oracles map: {tail[:3]}")

    qclass = {}
    for key, body in q_entries:
        qclass[key] = classify(key, "".join(body), {})
    fams = collections.OrderedDict()
    for fam, _ in FAMILIES + [("misc", None)]:
        fams[fam] = {"q": [], "o": []}
    for key, body in q_entries:
        fams[qclass[key]]["q"].append((key, body))
    for key, body in o_entries:
        fams[classify(key, "".join(body), qclass)]["o"].append((key, body))

    print(f"queries entries: {len(q_entries)}, oracle entries: {len(o_entries)}")
    for fam, d in fams.items():
        ql = sum(len(b) for _, b in d["q"])
        ol = sum(len(b) for _, b in d["o"])
        print(f"  {fam}: {len(d['q'])} queries ({ql} lines), "
              f"{len(d['o'])} oracles ({ol} lines), total ~{ql + ol}")
    hdr_len = len(header)
    print(f"  shared header: {hdr_len} lines")
    if dry:
        return

    # ---- emit ----
    # 1. shared helpers object: header body with `private ` dropped
    hdr_body = []
    started = False
    for l in header:
        if not started:
            if l.startswith("object PipelineQueries {"):
                started = True
            continue
        hdr_body.append(l.replace("  private val ", "  val ")
                         .replace("  private def ", "  def "))
    shared = (
        "package graft.queries\n\n" + IMPORTS +
        "\n/** Shared fixtures, memoized stages and oracle-SQL builders for\n"
        "  * the Pipeline* family objects (formerly PipelineQueries' private\n"
        "  * header — package-private so every family file keeps referencing\n"
        "  * them unqualified via `import PipelineShared._`).\n"
        "  */\n"
        "private[queries] object PipelineShared {\n" +
        "".join(hdr_body))
    if not shared.rstrip().endswith("}"):
        shared = shared.rstrip() + "\n}\n"
    open(f"{PKG_DIR}/PipelineShared.scala", "w").write(shared)

    fam_doc = {
        "multimodal": "image/audio/video modality queries",
        "dedup": "dedup, winnowing, LSH and contamination queries",
        "similarity": "embedding similarity / ANN / clustering queries",
        "text": "tokenizer, language-model and text-quality queries",
        "events": "event-stream, drift and experimentation queries",
        "profile": "profiling, compliance, retrieval and graph queries",
        "misc": "remaining pipeline queries",
    }
    obj_names = {}
    for fam, d in fams.items():
        if not d["q"] and not d["o"]:
            continue
        obj = "Pipeline" + fam.capitalize() + "Queries"
        obj_names[fam] = obj
        out = ["package graft.queries\n\n", IMPORTS,
               "import PipelineShared._\n",
               f"\n/** {fam_doc[fam]} — split from PipelineQueries "
               "(entries verbatim; the\n  * aggregate map in "
               "PipelineQueries is unchanged).\n  */\n",
               f"private[graft] object {obj} {{\n",
               "  val queries: Map[String, Q] = Map(\n"]
        for _, body in d["q"]:
            out.extend(with_comma(body))
        out.append("  )\n\n  val oracles: Map[String, String] = Map(\n")
        for _, body in d["o"]:
            out.extend(with_comma(body))
        out.append("  )\n}\n")
        open(f"{PKG_DIR}/{obj}.scala", "w").write("".join(out))

    agg_q = " ++\n    ".join(f"{obj_names[f]}.queries" for f in fams if f in obj_names)
    agg_o = " ++\n    ".join(f"{obj_names[f]}.oracles" for f in fams if f in obj_names)
    thin = f"""package graft.queries

import org.apache.spark.sql.{{DataFrame, SparkSession}}

/** Training-data-pipeline operator surface (dedup / text analysis /
  * similarity search / multimodal) over the `documents` and
  * `embeddings` tables, registered with DuckDB oracles wherever the
  * semantics are ANSI-SQL-expressible. Hash-unexpressible operators
  * (xxhash64-based MinHash/SimHash/LSH) are registered without an
  * oracle — the driver records a rows-only check — and additionally
  * covered by ScalaTest invariants in `src/test`.
  *
  * Entries live in the Pipeline*Queries family objects (split by
  * operator family, each with its queries and oracle SQL side by
  * side); this object is only the aggregation the driver contract
  * consumes.
  */
object PipelineQueries {{
  type Q = PipelineShared.Q

  val queries: Map[String, Q] = {agg_q}

  val oracles: Map[String, String] = {agg_o}
}}
"""
    open(SRC, "w").write(thin)
    print("written.")


if __name__ == "__main__":
    main()
