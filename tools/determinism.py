#!/usr/bin/env python3
"""Determinism sweep comparator: byte-level equality of two Verify dumps.

Round-3 convention, now a checked-in tool (round 8): run graft.Verify
twice — SPARK_GRAFT_CPUS=4 and =32 — into two dirs and require every
query's parquet output to be value-identical (pyarrow Table equality
after a no-op cast to a common schema). Catches partition-count
dependence: unstable sorts, order-sensitive float accumulation outside
the Parity conventions, rand()-style nondeterminism.

Usage: tools/determinism.py <dirA> <dirB> [query ...]
Exit 0 iff every query present in dirA exists in dirB and matches.
"""
import sys, glob, os
import pyarrow.parquet as pq


def read(d):
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return None
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files])


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    names = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(a_dir, "*"))
        if os.path.isdir(p))
    if only:
        names = [n for n in names if n in only]
    bad = []
    for name in names:
        ta = read(os.path.join(a_dir, name))
        tb_dir = os.path.join(b_dir, name)
        tb = read(tb_dir) if os.path.isdir(tb_dir) else None
        if ta is None or tb is None:
            bad.append(f"{name}: missing output ({'A' if ta is None else 'B'})")
            continue
        if ta.schema != tb.schema:
            bad.append(f"{name}: schema differs")
            continue
        if not ta.equals(tb):
            bad.append(f"{name}: values differ")
    for b in bad:
        print("VIOLATION", b)
    print(f"{len(names) - len(bad)} identical, {len(bad)} violations")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
