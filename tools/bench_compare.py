#!/usr/bin/env python3
"""Compare two bench outputs per query (round-over-round regressions).

Usage: python3 tools/bench_compare.py <old> <new> [threshold] [--norm]

Each argument is either a driver BENCH_r{N}.json (the JSON line is
recovered from "parsed" or the "tail" text) or a raw one-line JSON file
from `graft.Bench`. Prints per-query deltas sorted by regression,
flagging changes beyond the threshold factor (default 1.5×).

--norm divides every ratio by the MEDIAN ratio over the common query
set before flagging. This container's background load swings whole-run
timings ±30% between rounds (r6 adjudication); the median over ~100+
common queries estimates that environment multiplier, so normalized
ratios isolate per-query code effects. Only meaningful when most
common queries are code-untouched between the two runs — after a
broad optimization pass, the median absorbs part of the real win.

Driver-side python only; never a library dependency.
"""
import json
import re
import statistics
import sys


def load(path):
    txt = open(path).read()
    try:
        doc = json.loads(txt)
        if isinstance(doc, dict) and "queries" in doc:
            return doc  # raw bench line
        if isinstance(doc, dict):
            if isinstance(doc.get("parsed"), dict):
                return doc["parsed"]
            m = re.search(r'\{"metric".*\}', doc.get("tail", ""))
            if m:
                return json.loads(m.group(0))
    except json.JSONDecodeError:
        m = re.search(r'\{"metric".*\}', txt)
        if m:
            return json.loads(m.group(0))
    raise SystemExit(f"cannot find a bench JSON line in {path}")


def main():
    argv = [a for a in sys.argv[1:] if a != "--norm"]
    norm = "--norm" in sys.argv
    old, new = load(argv[0]), load(argv[1])
    thr = float(argv[2]) if len(argv) > 2 else 1.5
    oq, nq = old["queries"], new["queries"]
    env = 1.0
    if norm:
        common = [nq[k] / oq[k] for k in set(oq) & set(nq) if oq[k] > 0]
        if len(common) >= 5:
            env = statistics.median(common)
            print(f"environment multiplier (median over {len(common)} "
                  f"common queries): {env:.3f} — ratios below are "
                  "divided by it\n")
        else:
            norm = False
            print(f"only {len(common)} common queries — too few to "
                  "estimate the environment multiplier; showing RAW "
                  "ratios\n")
    # per-query hypervisor-steal columns (committed by Bench since r15:
    # "steals" map alongside "queries") — a flagged line whose steal
    # column carries cpu-seconds is adjudicating host co-tenant
    # contention, not this code
    ost = old.get("steals", {}) or {}
    nst = new.get("steals", {}) or {}
    rows = []
    for k in sorted(set(oq) | set(nq)):
        a, b = oq.get(k), nq.get(k)
        ratio = (b / a / env) if (a and b and a > 0) else None
        rows.append((k, a, b, ratio))
    rows.sort(key=lambda r: -(r[3] or 0))
    flagged = 0
    for k, a, b, ratio in rows:
        mark = ""
        if ratio is not None and ratio >= thr:
            mark = "  <-- regression"
            flagged += 1
            sa, sb = ost.get(k), nst.get(k)
            if sa is not None or sb is not None:
                fsa = f"{sa:.1f}" if sa is not None else "-"
                fsb = f"{sb:.1f}" if sb is not None else "-"
                mark += f" [steal {fsa}->{fsb}s]"
                if sb is not None and b and sb >= 0.5 * max(b - (a or 0), 0):
                    mark += " (contended?)"
        elif a is None:
            mark = "  (new)"
        elif b is None:
            mark = "  (removed)"
        fa = f"{a:7.2f}" if a is not None else "      -"
        fb = f"{b:7.2f}" if b is not None else "      -"
        fr = f"{ratio:5.2f}x" if ratio is not None else "     -"
        print(f"{k:28s} {fa} -> {fb}  {fr}{mark}")
    print(f"\ntotal {old.get('value', 0):.2f}s -> {new.get('value', 0):.2f}s"
          f" over {len(oq)} -> {len(nq)} queries; {flagged} flagged >= {thr}x"
          + (f" (env-normalized by {env:.3f})" if norm else ""))
    sys.exit(0)


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into head
        sys.exit(0)
