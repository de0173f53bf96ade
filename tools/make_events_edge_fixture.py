#!/usr/bin/env python3
"""Build the EVENTS edge-case fixture: a copy of an sf dir whose
`events` table gains adversarial users the driver-generated stream
never contains — while respecting the documented operator contracts
(unique ts per series, non-null values):

  - a single-event user (every lag/window/pair op sees an empty set)
  - a two-event user (minimal pair/window fill)
  - a CONSTANT-value user (stddev = 0, MAD = 0: every z-score-like
    denominator is zero)
  - a zero-value user (0/0 and log/ratio hazards)
  - a microsecond-adjacent user (dt = 1 µs slopes)
  - a huge-value user (1e12 — integer-cents and sum-overflow headroom)

Usage: make_events_edge_fixture.py [srcdir] [dstdir]
"""
import shutil, sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_events_edge")
    dst.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        if t != "events":
            shutil.copy(src / f"{t}.parquet", dst / f"{t}.parquet")
    ev = pq.read_table(src / "events.parquet")
    base_uid = max(ev.column("user_id").to_pylist()) + 1
    base_eid = max(ev.column("event_id").to_pylist()) + 1
    import datetime as _dt
    _max = max(ev.column("ts").to_pylist())
    ts0 = int(_max.timestamp() * 1_000_000) + 1_000_000
    types = ["view", "click", "purchase", "refund"]

    rows = []  # (event_id, ts_us, user_id, event_type, value, props)
    eid = base_eid

    def add(uid, ts_us, etype, value):
        nonlocal eid
        rows.append((eid, ts_us, uid, etype, value, '{"k": 1}'))
        eid += 1

    # single-event user
    add(base_uid + 0, ts0, "view", 3.25)
    # two-event user
    add(base_uid + 1, ts0, "view", 1.0)
    add(base_uid + 1, ts0 + 60_000_000, "click", 2.0)
    # constant-value user (30 events: windows fill, stddev/MAD = 0)
    for i in range(30):
        add(base_uid + 2, ts0 + i * 60_000_000, types[i % 4], 7.5)
    # zero-value user
    for i in range(12):
        add(base_uid + 3, ts0 + i * 60_000_000, types[i % 4], 0.0)
    # microsecond-adjacent user (dt = 1 µs, unique ts)
    for i in range(10):
        add(base_uid + 4, ts0 + i, "view", float(i))
    # huge-value user (20 events: w=14 zscore/autocorr windows FILL,
    # exercising every five-sums/cancellation-prone denominator)
    for i in range(20):
        add(base_uid + 5, ts0 + i * 60_000_000, types[i % 4], 1.0e12 + i)

    schema = ev.schema
    ts_type = schema.field("ts").type
    cols = {
        "event_id": pa.array([r[0] for r in rows], schema.field("event_id").type),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(ts_type),
        "user_id": pa.array([r[2] for r in rows], schema.field("user_id").type),
        "event_type": pa.array([r[3] for r in rows], schema.field("event_type").type),
        "value": pa.array([r[4] for r in rows], schema.field("value").type),
        "props": pa.array([r[5] for r in rows], schema.field("props").type),
    }
    extra = pa.table([cols[f.name] for f in schema], schema=schema)
    pq.write_table(pa.concat_tables([ev, extra]), dst / "events.parquet")
    print(f"events edge fixture at {dst}: {ev.num_rows} + {len(rows)} events, "
          f"{6} adversarial users")


if __name__ == "__main__":
    main()
