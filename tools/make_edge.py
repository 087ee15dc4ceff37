#!/usr/bin/env python3
"""Fabricate deterministic hostile edge fixtures (round-5 verdict item #4).

Each fixture is a full testdata directory (all 10 tables); the 9
non-documents tables are copied verbatim from the source SF and only
documents.parquet is replaced by a hostile variant:

  empty      every doc's text is '' (plus a whitespace-only and a
             punctuation-only row) — tokenizers, shingles, and stats see
             zero tokens everywhere
  one_doc    a 1-row corpus — every per-corpus aggregate has support 1,
             every pair generator has zero pairs
  identical  all docs carry doc 0's text — maximal duplicate density:
             every pair is a dup, every shingle is corpus-hot
  unicode    original text interleaved with CJK/Cyrillic/accents/emoji/
             combining marks — the [a-z0-9_'] pin must tokenize to
             IDENTICAL output in Spark and DuckDB
  long       the original corpus plus ONE 100k-token document — per-doc
             explode width, chunk windows, and quadratic-in-length
             kernels all get their worst row

Deterministic: pure functions of the source fixture, no RNG.
Usage: make_edge.py [src_sf_dir] [out_root]
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_edge"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

docs = pq.read_table(f"{SRC}/documents.parquet").to_pylist()

UNI = ("日本語テキスト Ünïcødé czełść Привет мир 🚀💡 "
       "étude İstanbul Kelvin ﬁnance ａｂｃ ")


def variant(name, rows):
    for r in rows:
        r["n_chars"] = len(r["text"])
    d = f"{OUT}/{name}"
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        if t != "documents":
            shutil.copyfile(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string()), ("source", pa.string()),
                        ("n_chars", pa.int64())])
    cols = {k: [r[k] for r in rows] for k in
            ["doc_id", "text", "lang", "source", "n_chars"]}
    pq.write_table(pa.table(cols, schema=schema), f"{d}/documents.parquet")
    print(f"{name}: {len(rows)} docs")


def copy_rows():
    return [dict(r) for r in docs]


# 1. empty: all-empty text, plus whitespace-only and punctuation-only rows
rows = copy_rows()
for r in rows:
    r["text"] = ""
rows[1 % len(rows)]["text"] = "   \t  \n "
rows[2 % len(rows)]["text"] = "!!! ... ---"
variant("empty", rows)

# 2. one_doc
variant("one_doc", copy_rows()[:1])

# 3. identical: every doc carries doc 0's text
rows = copy_rows()
for r in rows:
    r["text"] = docs[0]["text"]
variant("identical", rows)

# 4. unicode: interleave a hostile unicode run into every doc's text
rows = copy_rows()
for r in rows:
    toks = r["text"].split(" ")
    mid = len(toks) // 2
    r["text"] = " ".join(toks[:mid]) + " " + UNI + " ".join(toks[mid:])
variant("unicode", rows)

# 5. long: original corpus + ONE 100k-token doc. Tokens are all DISTINCT
# (suffix = absolute position): the fixture stresses per-doc WIDTH
# (explode fan-out, chunk windows, rolling hashes, quadratic-in-length
# kernels); within-doc token repetition is a different pathology, already
# covered corpus-wide by `identical` — and repeated trigrams at this
# length make position-level oracle self-joins quadratic (86 repeats of
# every trigram turned the DuckDB replay into hours).
rows = copy_rows()
vocab = ["alpha", "beta", "gamma", "delta", "merge", "scan", "sort",
         "key", "window", "hash", "join", "stream"]
long_text = " ".join(vocab[i % len(vocab)] + str(i)
                     for i in range(100_000))
rows.append({"doc_id": max(r["doc_id"] for r in rows) + 1,
             "text": long_text, "lang": "en", "source": "src_long",
             "n_chars": 0})
variant("long", rows)

# 6. boilerplate (round-10 verdict item 2): ONE 8-token window pasted
# into 50% of otherwise-unique docs — the hot-key straggler fixture for
# every window/hash-keyed dedup shape (sharedNgramStats, duplicatedSpans,
# splitContamination, curationTags' md5 family). Unlike `identical`,
# docs stay distinct, so nothing collapses early: the hot window's rows
# genuinely concentrate on one hash key and the partial-aggregated
# shapes must stay correct AND finish.
rows = copy_rows()
HOT = "terms of service apply to all content here"
for r in rows:
    if r["doc_id"] % 2 == 0:
        toks = r["text"].split(" ")
        mid = len(toks) // 2
        r["text"] = " ".join(toks[:mid] + HOT.split(" ") + toks[mid:])
variant("boilerplate", rows)

print(f"edge fixtures at {OUT}")
