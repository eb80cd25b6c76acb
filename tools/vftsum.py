#!/usr/bin/env python3
"""Summarize per-phase timings from a VeryFastTree-TPU progress log.

Equivalent of the reference's tools/vftsum.py: parses the timestamped progress
lines ("   12.34 seconds: <phase>") from stderr / a -log file and reports time
spent per phase.

Usage: vftsum.py logfile   (or pipe stderr in)
"""
import re
import sys
from collections import OrderedDict

LINE = re.compile(r"^\s*\+?\s*(\d+\.\d+) seconds?: (.*)$")

PHASES = [
    ("Read alignment", "read"),
    ("Identified unique", "uniquify"),
    ("Top hits for", "top-hits init"),
    ("Checking top hits", "top-hits check"),
    ("Joined", "NJ joins"),
    ("ME NNI round", "ME NNIs"),
    ("SPR round", "SPRs"),
    ("ML Lengths", "ML lengths"),
    ("ML-NNI round", "ML NNIs"),
    ("Site likelihoods", "CAT rates"),
    ("Optimizing GTR", "GTR fit"),
    ("ML split tests", "SH supports"),
    ("Local bootstrap", "ME bootstrap"),
    ("Optimizing alpha", "Gamma"),
]


def classify(msg):
    for prefix, name in PHASES:
        if msg.startswith(prefix):
            return name
    return "other"


def main():
    fp = open(sys.argv[1]) if len(sys.argv) > 1 else sys.stdin
    events = []
    for line in fp:
        m = LINE.match(line.rstrip())
        if m:
            events.append((float(m.group(1)), classify(m.group(2))))
    if not events:
        print("no progress lines found")
        return 1
    totals = OrderedDict()
    prev_t = 0.0
    for t, phase in events:
        totals[phase] = totals.get(phase, 0.0) + (t - prev_t)
        prev_t = t
    total = prev_t
    print(f"{'phase':<16}{'seconds':>10}{'%':>7}")
    for phase, secs in totals.items():
        print(f"{phase:<16}{secs:>10.2f}{100.0 * secs / total if total else 0:>6.1f}%")
    print(f"{'TOTAL':<16}{total:>10.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
