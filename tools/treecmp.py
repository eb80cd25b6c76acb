#!/usr/bin/env python3
"""Robinson-Foulds comparison of two Newick trees -- the correctness oracle.

Equivalent of the reference's tools/treecmp.py (which needs ete3); this one is
dependency-free.  Prints the same style of result: common splits, RF distance,
and accuracy %.

Usage: treecmp.py ref.nwk test.nwk
"""
import sys


def tokenize(newick):
    buf = []
    for ch in newick:
        if ch in "():;,":
            if buf:
                yield "".join(buf)
                buf = []
            yield ch
        elif not ch.isspace():
            buf.append(ch)
    if buf:
        yield "".join(buf)


def splits(newick):
    tokens = list(tokenize(newick))
    all_leaves = set()
    stack = [[]]
    clades = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t == "(":
            stack.append([])
        elif t == ")":
            grp = stack.pop()
            merged = frozenset().union(*grp)
            clades.append(merged)
            stack[-1].append(merged)
        elif t == ":":
            i += 1  # skip branch length
        elif t in ",;":
            pass
        else:
            if tokens[i - 1] != ")":  # not a support label
                leaf = frozenset([t])
                all_leaves.add(t)
                stack[-1].append(leaf)
        i += 1
    all_leaves = frozenset(all_leaves)
    out = set()
    for c in clades:
        if 1 < len(c) < len(all_leaves) - 1:
            other = all_leaves - c
            out.add(min(c, other, key=lambda s: (len(s), sorted(s))))
    return out, all_leaves


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 1
    s1, l1 = splits(open(sys.argv[1]).read())
    s2, l2 = splits(open(sys.argv[2]).read())
    if l1 != l2:
        print("ERROR: trees have different leaf sets "
              f"({len(l1)} vs {len(l2)} leaves)")
        return 1
    common = len(s1 & s2)
    rf = len(s1 ^ s2)
    denom = max(len(s1), len(s2))
    print(f"leaves: {len(l1)}  splits: {len(s1)} vs {len(s2)}  "
          f"common: {common}  RF: {rf}  "
          f"accuracy: {100.0 * common / denom if denom else 100.0:.2f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
