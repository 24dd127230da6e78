#!/usr/bin/env python3
"""Regenerate the committed events-ts-layout fixtures.

The driver's testdata generator has shipped events.ts under different
physical parquet layouts across rounds (INT64 TIMESTAMP(NANOS), then
timestamp[us] NTZ). graft's ingestion is schema-adaptive
(Tables.normalizeEventTs); EventsTsLayoutSpec certifies every layout
produces identical query output by reading the three fixtures written
here — same logical rows, three physical encodings:

  events_ts_nanos/  INT64 TIMESTAMP(NANOS)    -> Spark: LongType (nanosAsLong)
  events_ts_ntz/    timestamp[us], no tz      -> Spark: TimestampNTZType
  events_ts_utc/    timestamp[us], UTC        -> Spark: TimestampType

Run from the repo root: python3 scripts/make_ts_fixtures.py
(dev-only tooling; the library itself has no python dependency)
"""
import datetime as dt
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

OUT = pathlib.Path(__file__).resolve().parent.parent / "src/test/resources/fixtures"

BASE = dt.datetime(2024, 3, 1, 8, 0, 0)
rows = []
# 3 users x a morning of events: gaps >30min split sessions, clicks follow
# views within the 6h attribution window -- enough structure that the
# hourly/session/join queries all produce non-trivial output.
for i in range(24):
    user = 1 + i % 3
    # minutes 0,7,14,... with a 2h jump after the 15th event
    ts = BASE + dt.timedelta(minutes=7 * i + (120 if i >= 15 else 0))
    etype = "view" if i % 4 < 3 else "click"
    rows.append((i + 1, ts, user, etype, round(0.5 * i, 2), "{}"))

event_id = pa.array([r[0] for r in rows], pa.int64())
user_id = pa.array([r[2] for r in rows], pa.int64())
etype = pa.array([r[3] for r in rows], pa.string())
value = pa.array([r[4] for r in rows], pa.float64())
props = pa.array([r[5] for r in rows], pa.string())
ts_py = [r[1] for r in rows]

layouts = {
    "events_ts_nanos": pa.array(ts_py, pa.timestamp("ns")),
    "events_ts_ntz": pa.array(ts_py, pa.timestamp("us")),
    "events_ts_utc": pa.array(ts_py, pa.timestamp("us", tz="UTC")),
}

for name, ts_arr in layouts.items():
    table = pa.table(
        {
            "event_id": event_id,
            "ts": ts_arr,
            "user_id": user_id,
            "event_type": etype,
            "value": value,
            "props": props,
        }
    )
    dest = OUT / name
    dest.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, dest / "events.parquet")
    print(name, pq.read_schema(dest / "events.parquet").field("ts").type)
