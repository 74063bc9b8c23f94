#!/usr/bin/env python3
"""Mechanical cross-round perf-regression ledger (VERDICT r19 item 1).

Single driver bench runs swing +-25% with host load (r19: the driver
single-run total said +5.6% while the idle protocol said -23%), so
round-over-round comparison must key on the committed per-key
idle-median ledger, not on BENCH_r{N}.json deltas or prose.

BENCHLEDGER.jsonl: one line per round —
  {"round": N, "sf": "...", "runs": R, "total_med": T,
   "keys": {"<key>": <median sec over the idle runs>, ...}}

Usage:
  # after the round's idle three-run (Bench.scala x3 on a load<1 host,
  # output concatenated into one log):
  python3 tools/benchledger.py append <round> <idle_log> [BENCHLEDGER.jsonl]
  # then diff the last two rounds and paste the output into BASELINE.md:
  python3 tools/benchledger.py diff [BENCHLEDGER.jsonl]

diff flags a key when its median moved > 25% AND > 0.15 s between the
last two recorded rounds (both gates: small keys jitter by ratio, big
keys by seconds). New/removed keys are listed separately. Informational
exit 0 — the human adjudicates (a deliberate re-plan is expected to
move its key; the point is that it moves IN THE LEDGER, not silently).
"""
import json
import statistics
import sys

LEDGER = "BENCHLEDGER.jsonl"


def read_ledger(path):
    try:
        with open(path) as f:
            return [json.loads(l) for l in f if l.strip()]
    except FileNotFoundError:
        return []


def cmd_append(rnd, log_path, ledger_path):
    runs = []  # list of {key: sec}
    sf = None
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            if d.get("metric") == "queries_full":
                runs.append(d["queries"])
                sf = d.get("sf", sf)
    if not runs:
        sys.exit(f"no queries_full lines found in {log_path}")
    keys = sorted(set().union(*[set(r) for r in runs]))
    # Bench.scala records a crashed key as -1.0 in queries_full (its own
    # total line already excludes negatives). A crash must surface as a
    # loud CRASHED entry, not poison the medians or read as "improved".
    meds, crashed = {}, []
    for k in keys:
        good = [r[k] for r in runs if k in r and r[k] >= 0]
        if good:
            meds[k] = round(statistics.median(good), 3)
        if any(k in r and r[k] < 0 for r in runs):
            crashed.append(k)
    entry = {"round": int(rnd), "sf": sf, "runs": len(runs),
             "total_med": round(statistics.median(
                 [sum(v for v in r.values() if v >= 0) for r in runs]), 2),
             "keys": meds}
    if crashed:
        entry["crashed"] = sorted(crashed)
    with open(ledger_path, "a") as f:
        f.write(json.dumps(entry, sort_keys=True) + "\n")
    print(f"appended round {rnd}: {len(meds)} keys, "
          f"{entry['runs']} runs, total_med {entry['total_med']} s"
          + (f", CRASHED: {crashed}" if crashed else ""))


def cmd_diff(ledger_path):
    rounds = read_ledger(ledger_path)
    if len(rounds) < 2:
        sys.exit(f"need >= 2 rounds in {ledger_path}, have {len(rounds)}")
    a, b = rounds[-2], rounds[-1]
    ka, kb = a["keys"], b["keys"]
    print(f"== BENCHLEDGER diff: round {a['round']} -> {b['round']} "
          f"(idle median-of-{b['runs']}, {b['sf']}) ==")
    print(f"total_med: {a['total_med']} -> {b['total_med']} s "
          f"({(b['total_med'] / a['total_med'] - 1) * 100:+.1f}%)")
    moved = []
    for k in sorted(set(ka) & set(kb)):
        old, new = ka[k], kb[k]
        if old <= 0:
            continue
        delta = new - old
        if abs(delta) / old > 0.25 and abs(delta) > 0.15:
            moved.append((delta / old, k, old, new))
    for rel, k, old, new in sorted(moved, reverse=True):
        tag = "REGRESSED" if rel > 0 else "improved "
        print(f"  {tag} {k:<28} {old:6.2f} -> {new:6.2f} s ({rel * 100:+.0f}%)")
    if not moved:
        print("  no key moved > 25% and > 0.15 s")
    for k in sorted(set(kb) - set(ka)):
        print(f"  NEW       {k:<28}          {kb[k]:6.2f} s")
    for k in sorted(set(ka) - set(kb)):
        print(f"  REMOVED   {k:<28} {ka[k]:6.2f} s")
    for k in b.get("crashed", []):
        print(f"  CRASHED   {k:<28} (negative sentinel in >= 1 run)")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "append":
        cmd_append(sys.argv[2], sys.argv[3],
                   sys.argv[4] if len(sys.argv) > 4 else LEDGER)
    elif len(sys.argv) >= 2 and sys.argv[1] == "diff":
        cmd_diff(sys.argv[2] if len(sys.argv) > 2 else LEDGER)
    else:
        sys.exit(__doc__)
