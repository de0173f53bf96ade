#!/usr/bin/env python3
"""Build the EDGE-CASE correctness fixture: a copy of an sf dir whose
`documents` table gains adversarial rows the driver-generated corpus
never contains — an empty doc, a punctuation-only doc (normalizes to
empty), and a whitespace-only doc. Every documents-derived query is
then run through the same Verify + compare gate on this fixture
(dev-loop tool, driver-side python only — see tools/compare.py).

Usage: make_edge_fixture.py [srcdir] [dstdir]
"""
import shutil, sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_edge_fixture")
    dst.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        if t != "documents":
            shutil.copy(src / f"{t}.parquet", dst / f"{t}.parquet")
    docs = pq.read_table(src / "documents.parquet")
    base = max(docs.column("doc_id").to_pylist()) + 1
    extra_rows = [
        (base + 0, "", "en", "edge", 0),            # empty
        (base + 1, "!!! ??? ... ;;;", "en", "edge", 15),  # punct-only: normalizes to ''
        (base + 2, "   \t  ", "en", "edge", 6),     # whitespace-only
        (base + 3, "a", "en", "edge", 1),           # single 1-char token
    ]
    cols = {
        "doc_id": [r[0] for r in extra_rows],
        "text": [r[1] for r in extra_rows],
        "lang": [r[2] for r in extra_rows],
        "source": [r[3] for r in extra_rows],
        "n_chars": [r[4] for r in extra_rows],
    }
    extra = pa.table(cols, schema=docs.schema)
    pq.write_table(pa.concat_tables([docs, extra]), dst / "documents.parquet")
    print(f"edge fixture at {dst}: {docs.num_rows} + {len(extra_rows)} docs")


if __name__ == "__main__":
    main()
