#!/usr/bin/env python3
"""Regenerate the text_compress_ratio GOLDEN oracle table.

No SQL engine exposes deflate, so the oracle for text_compress_ratio
is a checked-in golden computed INDEPENDENTLY of the Spark
implementation: python zlib.compress(text_utf8, level=6) — the same
zlib stream format as java.util.zip.Deflater(6, nowrap=false), byte-
size-identical (validated over the full corpus + edge fixture before
this was wired). SparkEntry.oracleSql inlines the table as a VALUES
list from the generated resource, and DuckDB computes the ratio
division itself so the FP op is engine-identical.

The golden binds to the CORRECTNESS-GATE scale (sf0.01 documents, the
dir the driver always gates on). Regenerate only when the driver
regenerates testdata:

    python3 tools/make_compress_golden.py /root/testdata/sf0.01
"""
import sys
import zlib

import duckdb

import os
import re


def corpus_tag(sfdir):
    """Mirror SparkEntry.corpusTag: basename, lowercased, non-alnum
    stripped — the key the golden resource is looked up under."""
    return re.sub(r"[^a-z0-9]", "", os.path.basename(sfdir.rstrip("/")).lower())


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = f"src/main/resources/compress_golden_{corpus_tag(sfdir)}.csv"
    docs = duckdb.sql(
        f"select doc_id, text from '{sfdir}/documents.parquet' order by doc_id"
    ).fetchall()
    with open(out, "w") as f:
        f.write("doc_id,n_bytes,n_deflate\n")
        for did, text in docs:
            raw = (text or "").encode("utf-8")
            f.write(f"{did},{len(raw)},{len(zlib.compress(raw, 6))}\n")
    print(f"wrote {out}: {len(docs)} rows from {sfdir}")


if __name__ == "__main__":
    main()
