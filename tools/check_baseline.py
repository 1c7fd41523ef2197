#!/usr/bin/env python3
"""Builder gate (round-10 verdict item 2): every per-query number in a
BASELINE.md probe table must be grep-able from the JSON artifact the
section cites. Scans BASELINE.md for sections that name a BENCH_*.json
artifact, extracts `| qNNN... | <sec> |` table rows beneath them, and
checks each sf10/sf1 seconds value appears in the artifact verbatim
(to the printed precision). Exits non-zero listing any mismatch.

Usage: python3 tools/check_baseline.py [BASELINE.md]
"""
import json
import re
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "BASELINE.md"
text = open(path).read()

failures = []
checked = 0

# split on headers; a section owns the text to the next header
sections = re.split(r"^## ", text, flags=re.M)
for sec in sections:
    arts = re.findall(r"`(BENCH_\w+\.json)`", sec)
    if not arts:
        continue
    art = arts[0]
    try:
        queries = json.load(open(art)).get("queries", {})
    except FileNotFoundError:
        # sections may cite another section's artifact as floors only
        continue
    for m in re.finditer(
            r"^\|\s*(q\d+\w*)\s*\|\s*(?:([\d.]+)\s*→\s*)?\*{0,2}([\d.]+)\*{0,2}\s*\|",
            sec, flags=re.M):
        name, pre, shown = m.group(1), m.group(2), m.group(3)
        if name not in queries:
            continue  # floor-only rows cite a different artifact
        actual = queries[name]
        def matches(v):
            # match at the precision printed (narrative may round to
            # fewer decimals ONLY if the rounded value equals it)
            d = len(v.split(".")[1]) if "." in v else 0
            return f"{actual:.{d}f}" == v
        checked += 1
        # an arrow row (`before → after`) records a fix: the section's
        # artifact holds ONE side, the prose names the other's artifact
        if not (matches(shown) or (pre is not None and matches(pre))):
            failures.append(f"{art}: {name} shows {pre or ''}->{shown}, "
                            f"artifact has {actual}")

print(f"[check_baseline] {checked} table values checked against their artifacts")
for f in failures:
    print(f"[check_baseline] MISMATCH {f}")
sys.exit(1 if failures else 0)
