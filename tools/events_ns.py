#!/usr/bin/env python3
"""Rewrite a GenData events.parquet so `ts` is TIMESTAMP(NANOS).

Spark cannot write parquet nanosecond timestamps, so graft.tools.GenData
emits `ts` as a raw int64 of epoch-nanoseconds. The driver's events
tables carry a real TIMESTAMP(NANOS) logical type (Spark reads it back
as a long via spark.sql.legacy.parquet.nanosAsLong; DuckDB coerces it to
TIMESTAMP) — this script applies that one logical-type change in place.

Usage: python3 tools/events_ns.py <path/to/events.parquet>
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    path = sys.argv[1]
    t = pq.read_table(path)
    i = t.schema.get_field_index("ts")
    if not pa.types.is_int64(t.schema.field(i).type):
        print(f"ts already {t.schema.field(i).type}; nothing to do")
        return 0
    t = t.set_column(i, "ts", t.column("ts").cast(pa.timestamp("ns")))
    pq.write_table(t, path, compression="snappy",
                   row_group_size=1 << 20, use_deprecated_int96_timestamps=False,
                   coerce_timestamps=None, allow_truncated_timestamps=False)
    print(f"rewrote {path}: ts -> timestamp[ns], rows={t.num_rows}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
