#!/usr/bin/env python3
"""Per-query timing delta report (round-7, VERDICT r6 item 4).

Diffs two Verify times.json files (current vs previous round) and prints
the top regressions/improvements. Fail-soft by design: sf0.01 absolute
times carry ~±30% environment noise, so this is a trip-wire report for
eyeballs, not a gate — a 2×+ regression on a non-trivial time is the
signal that caught text_tokenize_tf in round 5.

Usage: tools/time_delta.py <prev_times.json> <cur_times.json> [top_n]
"""
import sys, json


def main():
    prev = json.load(open(sys.argv[1]))
    cur = json.load(open(sys.argv[2]))
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    rows = []
    for k in sorted(set(prev) & set(cur)):
        p, c = prev[k], cur[k]
        if p <= 0:
            continue
        rows.append((c / p, c - p, p, c, k))
    rows.sort(reverse=True)
    print(f"{'ratio':>7} {'delta_s':>8} {'prev_s':>7} {'cur_s':>7}  query")
    print("-- top regressions --")
    for r, d, p, c, k in rows[:top_n]:
        print(f"{r:7.2f} {d:8.3f} {p:7.3f} {c:7.3f}  {k}")
    print("-- top improvements --")
    for r, d, p, c, k in rows[-top_n:][::-1]:
        print(f"{r:7.2f} {d:8.3f} {p:7.3f} {c:7.3f}  {k}")
    only_prev = sorted(set(prev) - set(cur))
    only_cur = sorted(set(cur) - set(prev))
    if only_prev:
        print(f"removed keys: {', '.join(only_prev)}")
    if only_cur:
        print(f"new keys: {', '.join(only_cur)}")


if __name__ == "__main__":
    main()
