#!/usr/bin/env python3
"""Builder gate (round-10 verdict item 2, widened per round-11 items):
every per-query number in a BASELINE.md probe table must be grep-able
from a JSON artifact the section cites, and every cited sf10/floor
RATIO must equal sf10_sec / floor_sec at the printed precision.

Scans BASELINE.md for sections that name BENCH_*.json artifacts,
extracts `| qNNN... | <sec> |` table rows beneath them, and checks each
seconds value appears in AT LEAST ONE of the section's cited artifacts
verbatim (to the printed precision) — round-11 ADVICE: sections citing
several artifacts had all but the first silently skipped. Rows shaped
`| q | sf10 | floor | N.N× |` additionally get the ratio re-derived
from the row's own two numbers. Exits non-zero listing any mismatch.

Usage: python3 tools/check_baseline.py [BASELINE.md]
"""
import json
import re
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "BASELINE.md"
text = open(path).read()

failures = []
checked = 0
ratios_checked = 0


def load(art):
    try:
        return json.load(open(art)).get("queries", {})
    except FileNotFoundError:
        return None


def matches(actual, shown):
    # match at the precision printed (narrative may round to fewer
    # decimals ONLY if the rounded value equals it)
    d = len(shown.split(".")[1]) if "." in shown else 0
    return f"{actual:.{d}f}" == shown


# split on headers; a section owns the text to the next header
sections = re.split(r"^## ", text, flags=re.M)
for sec in sections:
    art_names = []
    for a in re.findall(r"`(BENCH_\w+\.json)`", sec):
        if a not in art_names:
            art_names.append(a)
    arts = [(a, load(a)) for a in art_names]
    arts = [(a, q) for a, q in arts if q is not None]
    if not arts:
        continue
    for m in re.finditer(
            r"^\|\s*(q\d+\w*)\s*\|\s*(?:([\d.]+)\s*→\s*)?\*{0,2}([\d.]+)\*{0,2}\s*\|"
            r"(?:\s*([\d.]+)\s*\|\s*\*{0,2}([\d.]+)×\*{0,2}\s*\|)?",
            sec, flags=re.M):
        name, pre, shown, floor, ratio = m.groups()
        holders = [(a, q[name]) for a, q in arts if name in q]
        if not holders:
            continue  # floor-only rows cite a different section's artifact
        checked += 1
        # an arrow row (`before → after`) records a fix: an artifact
        # holds ONE side, the prose names the other's artifact
        if not any(matches(actual, shown) or
                   (pre is not None and matches(actual, pre))
                   for _, actual in holders):
            failures.append(
                f"{'/'.join(a for a, _ in holders)}: {name} shows "
                f"{pre or ''}->{shown}, artifacts have "
                f"{[round(v, 4) for _, v in holders]}")
        # ratio column: re-derive from the row's own sf10 + floor values
        # (one floor convention per table — round-11 verdict finding 2)
        if floor is not None and ratio is not None and float(floor) > 0:
            ratios_checked += 1
            derived = float(shown) / float(floor)
            d = len(ratio.split(".")[1]) if "." in ratio else 0
            # accept the printed rounding plus one ulp (narratives wrote
            # e.g. 4.54/0.329 = 13.8 as 13.8× or 13.9× pre-rule)
            ok = abs(derived - float(ratio)) <= 0.5 * 10 ** (-d) + 1e-9 or \
                f"{derived:.{d}f}" == ratio
            if not ok:
                failures.append(
                    f"ratio: {name} shows {ratio}x but {shown}/{floor} "
                    f"= {derived:.2f}")

print(f"[check_baseline] {checked} table values checked against their "
      f"artifacts, {ratios_checked} ratios re-derived")
for f in failures:
    print(f"[check_baseline] MISMATCH {f}")
sys.exit(1 if failures else 0)
