"""Test helpers: synthetic alignments + running the reference oracle."""
from __future__ import annotations

import os
import random
import shutil
import subprocess

import numpy as np

ORACLE = os.environ.get("VFT_ORACLE", "/tmp/refbuild/VeryFastTree")


def have_oracle() -> bool:
    return shutil.which(ORACLE) is not None or os.path.exists(ORACLE)


def run_oracle(args, fasta_path):
    """Run the reference binary; returns (newick, stderr_text)."""
    res = subprocess.run([ORACLE] + args + [fasta_path], capture_output=True,
                         text=True, timeout=600)
    if res.returncode != 0:
        raise RuntimeError(f"oracle failed: {res.stderr[-2000:]}")
    return res.stdout.strip(), res.stderr


def simulate_alignment(n_seqs=40, n_pos=300, alphabet="ACGT", seed=1,
                       mutation=0.15, gap_frac=0.02):
    """Evolve sequences along a random binary tree (JC-style) -> list[str]."""
    rng = random.Random(seed)
    root = [rng.choice(alphabet) for _ in range(n_pos)]
    seqs = [root]
    while len(seqs) < n_seqs:
        parent = seqs[rng.randrange(len(seqs))]
        child = list(parent)
        for p in range(n_pos):
            if rng.random() < mutation:
                child[p] = rng.choice(alphabet)
        seqs.append(child)
    out = []
    for s in seqs:
        s = list(s)
        for p in range(n_pos):
            if rng.random() < gap_frac:
                s[p] = "-"
        out.append("".join(s))
    return out


def write_fasta(path, seqs, names=None):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            name = names[i] if names else f"seq{i:05d}"
            f.write(f">{name}\n{s}\n")


def parse_join_log(stderr_text):
    """Extract the join sequence from -verbose 3 oracle output.

    Lines look like: Join\ti\tj\t<criterion>\tlambda\t...\tnew\t<newnode>
    """
    joins = []
    for line in stderr_text.splitlines():
        if line.startswith("Join\t"):
            parts = line.split("\t")
            joins.append((int(parts[1]), int(parts[2])))
    return joins


# --- Robinson-Foulds distance (tools/treecmp.py logic, ete3-free) -----------

def newick_splits(newick: str):
    """Set of non-trivial splits (frozenset of leaf names, min side) of an
    unrooted tree given as Newick."""
    import io as _io
    tokens = []
    buf = []
    for ch in newick:
        if ch in "():;,":
            if buf:
                tokens.append("".join(buf))
                buf = []
            tokens.append(ch)
        elif not ch.isspace():
            buf.append(ch)
    # parse into children lists
    stack = [[]]
    leaves = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t == "(":
            stack.append([])
        elif t == ")":
            grp = stack.pop()
            merged = frozenset().union(*grp) if grp else frozenset()
            stack[-1].append(merged)
            # record the clade
            if len(stack) > 1 or True:
                pass
        elif t == ":":
            i += 1  # skip branch length token
        elif t in ",;":
            pass
        else:
            if tokens[i - 1] == ")":
                pass  # support label
            else:
                leaves.append(t)
                stack[-1].append(frozenset([t]))
        i += 1
    all_leaves = frozenset(leaves)

    # redo the walk collecting clades properly
    splits = set()
    stack = [[]]
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t == "(":
            stack.append([])
        elif t == ")":
            grp = stack.pop()
            merged = frozenset().union(*grp)
            if 1 < len(merged) < len(all_leaves) - 1:
                other = all_leaves - merged
                splits.add(min(merged, other, key=lambda s: (len(s), sorted(s))))
            stack[-1].append(merged)
        elif t == ":":
            i += 1
        elif t in ",;":
            pass
        else:
            if tokens[i - 1] != ")":
                stack[-1].append(frozenset([t]))
        i += 1
    return splits, all_leaves


def rf_distance(nw1: str, nw2: str):
    s1, l1 = newick_splits(nw1)
    s2, l2 = newick_splits(nw2)
    assert l1 == l2, "trees have different leaf sets"
    return len(s1 ^ s2), len(s1 | s2)
