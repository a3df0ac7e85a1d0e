#!/usr/bin/env python3
"""Golden-file generator (dev-time only; goldens are committed artifacts).

Runs the REFERENCE's own Python functions (imported from /root/reference,
which is pure-stdlib for the parse/chunk path) over a seeded fixture corpus
and dumps input->output pairs as JSON under src/test/resources/golden/.
ScalaTest asserts exact equality against these at `sbt -batch test`
(SURVEY.md §5.2; BASELINE.json north_rule: span-sequence equality).

No Python runs at test time. Provenance: reference snapshot 2025-09-05.
"""
import json
import os
import random
import sys

sys.path.insert(0, "/root/reference")

from src.ingestion.chunk_document import chunk_text
from src.ingestion.extract_paragraphs import (
    _clean_page_text, _split_on_blank_lines, _fallback_sentence_grouping,
    extract_paragraphs)
from src.ingestion.paragraph_utils import normalize_whitespace, paragraphize
from src.ingestion.normalizer import normalize_metadata, normalize_date
from src.ingestion.metadata_schema import extract_metadata

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "golden")
os.makedirs(OUT, exist_ok=True)

rng = random.Random(7)
WORDS = ("spark scala column row table join merge sort filter window stream "
         "batch hash key value data query plan group agg part line doc page "
         "chunk span text media außergewöhnlich naïve café 北京 データ 😀ok").split()


def salad(n, sep_pool=(" ",)):
    toks = [rng.choice(WORDS) for _ in range(n)]
    return "".join(t + rng.choice(sep_pool) for t in toks).strip()


def sentences(n):
    out = []
    for _ in range(n):
        s = salad(rng.randint(3, 12)).capitalize() + rng.choice(".!?")
        out.append(s)
    return " ".join(out)


# ---------- chunk_text fixtures (C1) ----------
def exact_len(n):
    """deterministic text of exactly n code points"""
    base = salad(max(1, n // 4 + 2))
    while len(base) < n:
        base += " " + salad(8)
    return base[:n]

chunk_cases = []
for text in ["", "a", exact_len(79), exact_len(80), exact_len(81),
             exact_len(419), exact_len(420), exact_len(421),
             exact_len(499), exact_len(500), exact_len(501),
             exact_len(919), exact_len(920), exact_len(921),
             exact_len(2500),
             "😀" * 450 + "中" * 200,  # astral + BMP: code-point slicing
             salad(400), sentences(40)]:
    for (cs, ov) in [(500, 80), (1000, 100), (100, 30)]:
        chunk_cases.append({
            "text": text, "chunk_size": cs, "overlap": ov,
            "chunks": chunk_text(text, cs, ov)})

# ---------- cleaning fixtures (T1–T5) ----------
clean_inputs = [
    "", "  \t ", "plain text",
    "foo-\nbar baz-\nqux",           # de-hyphenate
    "a-\nb-\nc",                     # overlapping hyphen candidates
    "über-\nmaß straße-\n北",        # unicode \w
    "x -\ny z-\n ",                  # hyphen break without \w on both sides
    "l1\nl2\n\nl3\n\n\n\nl4",        # lone newline vs blank line vs 3+
    "a\r\nb\rc",                     # \r normalize
    "tabs\t\tand  spaces   here",
    "  nbsp padded  ",     # python strip() strips NBSP
    "one.\nTwo sentences\nhere.",
    salad(60, sep_pool=(" ", "\n", " ", " ")),
    salad(120, sep_pool=(" ", "\n", "\n\n", " ", "\t")),
]
clean_cases = [{"text": t, "cleaned": _clean_page_text(t)} for t in clean_inputs]

# ---------- extract_paragraphs (C4–C7) ----------
para_inputs = [
    "", "   ", "short",
    # blank-line branch: raw has \n\n
    "\n\n".join(salad(30) for _ in range(4)),
    # raw \n\n but tiny paragraphs (min-80 filter)
    "tiny one\n\ntiny two\n\n" + salad(40),
    # fallback branch: sentences, no \n\n in raw
    sentences(30),
    sentences(3),
    # raw WITHOUT \n\n but cleaning would create one (\r\n\r\n)
    ("A" + sentences(10) + "\r\n\r\n" + sentences(10)),
    # raw WITH \n\n that cleaning collapses differently (\n\n\n\n runs)
    salad(25) + "\n\n\n\n" + salad(25),
    # single newlines only -> fallback after unwrap
    salad(80, sep_pool=(" ", "\n")),
    # mixed unicode sentences
    "Der Fluß fließt. Die Straße ist naß! Und 北京 ist groß? Klein.",
]
para_cases = [{"text": t, "paragraphs": extract_paragraphs(t)} for t in para_inputs]

# fallback grouping on already-clean text (C6 direct)
fb_inputs = [
    sentences(2), sentences(8), sentences(25),
    "Abc. " * 50,                       # many tiny sentences
    "X. " * 10,                         # residual < 80 dropped
    ("Y" * 700 + ". ") + ("Z" * 90 + "."),  # giant single sentences
]
fb_cases = [{"text": t, "groups": _fallback_sentence_grouping(t)} for t in fb_inputs]

blank_cases = [{"text": t, "parts": _split_on_blank_lines(t)} for t in [
    "a\n\nb", "a\n \t\nb\n\n\nc", "\n\nlead", "trail\n\n", "no split here"]]

# ---------- paragraphize (C8) ----------
pz_inputs = [
    "",
    "first fragment\n\nsecond paragraph that is long enough to stand alone",
    "tiny\n\n" + salad(20) + "\n\nalso tiny\n\n" + salad(20),  # first-pos short kept
    salad(20) + "\n\nshort\n\n" + salad(20),                   # middle merge
    salad(20) + "\n\nend bit",                                 # last merge
    "l1\nl2\nl3\n\n\n\nl4  l5\r\nl6",
    "  spaced   out\ttabs  \n\n ok then ",
]
pz_cases = [{"text": t, "min_len": 20, "paragraphs": paragraphize(t)} for t in pz_inputs]

# ---------- metadata (T6–T9) ----------
meta_cases = []
for raw in [
    {"/Title": "  My Doc  ", "/Author": "A. Writer", "/Producer": None,
     "/Creator": "LaTeX", "/CreationDate": "2025-08-20", "/ModDate": " 2025-8-3 ",
     "/Keywords": " k1, k2 ", "/AAPL:Keywords": ["a", "b"], "/rgid": "RG-1"},
    {"/Title": 123, "/Author": "", "/AAPL:Keywords": []},
    {},
    {"/Title": "Ünïcode Tîtle  ", "/rgid": None},
]:
    ex = extract_metadata(raw)
    norm = normalize_metadata({k.upper() if i % 2 else k: v
                               for i, (k, v) in enumerate(ex.items())})
    meta_cases.append({
        "raw": {k: (v if isinstance(v, (str, list)) or v is None else str(v))
                for k, v in raw.items()},
        "raw_nonstr": {k: True for k, v in raw.items()
                       if not isinstance(v, (str, list)) and v is not None},
        "extracted": ex,
        "normalized": norm})

date_cases = [{"in": s, "out": normalize_date(s)} for s in [
    "2025-08-20", "2025-8-3", "2024-02-29", "2023-02-29", "20-08-2025",
    "2025-13-01", "2025-00-10", "not a date", "", "2025-08-20T10:00:00"]]

# ---------- live ingest path: per-page chunk + enrichment order ----------
# mirrors src/scripts/ingest_documents.py:70-81 (chunk per page, 500/80,
# paragraph_index = enumerate within page) re-expressed as output spans with
# offset = global emission order (FIXTURES.md §2).
doc_cases = []
for d in range(6):
    n_spans = rng.randint(1, 7)
    spans = []
    for off in range(n_spans):
        kind = rng.choice(["pdf_page", "text", "html", "image", "figure", "table"])
        if kind in ("image", "figure", "table"):
            spans.append({"kind": kind, "text": "",
                          "media_ref": f"media://{d}-{off}", "offset": off})
        else:
            txt = salad(rng.randint(0, 260), sep_pool=(" ", " ", "\n"))
            spans.append({"kind": kind, "text": txt, "media_ref": "", "offset": off})
    out = []
    for s in spans:
        if s["kind"] in ("image", "figure", "table"):
            out.append({"kind": "media", "text": "", "media_ref": s["media_ref"]})
        else:
            for c in chunk_text(s["text"], 500, 80):
                out.append({"kind": "chunk", "text": c, "media_ref": ""})
    for i, o in enumerate(out):
        o["offset"] = i
    doc_cases.append({"doc_id": f"golden-{d}", "spans": spans, "out_spans": out})

# ---------- round-1 extension: surgical edge fixtures (fresh RNG so the
# original draws above are unchanged) ----------
rng2 = random.Random(99)

# astral chars straddling the 500-cp chunk boundary
astral_cases = []
for text in [
    "x" * 499 + "\U0001F600" + "y" * 300,       # astral AT cp 500
    "\U0001F600" * 499 + "Z" + "\U0001F600" * 200,
    ("ab\U0001F937\u200d\u2642" * 120),          # ZWJ sequences
    "\u00e9" * 420 + "e\u0301" * 120,            # precomposed vs combining
]:
    for (cs, ov) in [(500, 80), (100, 30)]:
        astral_cases.append({"text": text, "chunk_size": cs, "overlap": ov,
                             "chunks": chunk_text(text, cs, ov)})

# exotic whitespace through the cleaning chain (NEL, VT, FF, NBSP, IDEOSPACE)
ws_inputs = [
    "a\x85b\x0bc\x0cd",
    "\u3000wide\u3000 space\u3000",
    "mix\t\u00a0 of\u00a0\t odd  spaces",
    "end-\nof\u00ad-\nline",        # soft hyphen is \w? (Unicode: no)
    "\u2028line\u2029para",          # LS/PS are not \n
]
ws_clean = [{"text": t, "cleaned": _clean_page_text(t)} for t in ws_inputs]
ws_para = [{"text": t, "paragraphs": extract_paragraphs(t)} for t in ws_inputs]
ws_pz = [{"text": t, "min_len": 20, "paragraphs": paragraphize(t)} for t in ws_inputs]

# sentence-split punctuation edges
sent_inputs = [
    "What?! Yes. no. Maybe?  Sure!A glued capital.",
    "Ellipsis... Then. 3.14 is pi. Dr. Who arrived.",
    "ALL CAPS! SECOND HERE? third lower.",
]
sent_cases = [{"text": t, "groups": _fallback_sentence_grouping(t)} for t in sent_inputs]

golden_ext = {
    "chunk_text_edge.json": astral_cases,
    "clean_edge.json": ws_clean,
    "paragraphs_edge.json": ws_para,
    "paragraphize_edge.json": ws_pz,
    "sentences_edge.json": sent_cases,
}

golden = {
    "chunk_text.json": chunk_cases,
    "clean_page_text.json": clean_cases,
    "extract_paragraphs.json": para_cases,
    "fallback_grouping.json": fb_cases,
    "split_blank_lines.json": blank_cases,
    "paragraphize.json": pz_cases,
    "metadata.json": meta_cases,
    "normalize_date.json": date_cases,
    "extract_docs.json": doc_cases,
}
golden.update(golden_ext)
for name, data in golden.items():
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(data, f, ensure_ascii=False, indent=1)
    print(f"wrote {name}: {len(data)} cases")
