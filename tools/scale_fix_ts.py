#!/usr/bin/env python3
"""Post-step for graft.ScaleGen output: restore the events.ts logical type.

Spark cannot write nanosecond parquet timestamps, so ScaleGen emits ts as
plain int64 nanos; the driver-generated SF dirs store timestamp[ns]. The
Spark side reads either layout identically (explicit LongType schema reads
the raw int64), but the DuckDB oracle needs the timestamp logical type —
without it every date_trunc/interval oracle binds against BIGINT and fails.

Usage: tools/scale_fix_ts.py <scaled_dir>
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq

d = sys.argv[1]
path = f"{d}/events.parquet"
t = pq.read_table(path)
if t.schema.field("ts").type == pa.timestamp("ns"):
    print(f"{path}: ts already timestamp[ns]")
else:
    cols = {n: t.column(n) for n in t.column_names}
    cols["ts"] = t.column("ts").cast(pa.timestamp("ns"))
    pq.write_table(pa.table(cols), path)
    print(f"{path}: ts int64 -> timestamp[ns]")
