#!/usr/bin/env python3
"""Extract published substitution-model data tables from the reference sources.

The BLOSUM45 profile-distance table (src/DistanceMatrix.tcc:162-215) and the
JTT92 / WAG01 / LG08 amino-acid rate matrices + stationary distributions
(src/TransitionMatrix.tcc:284-357) are published scientific constants (Jones et
al. 1992, Whelan & Goldman 2001, Le & Gascuel 2008, Henikoff & Henikoff 1992).
This script parses them out of the reference implementation once and emits
``veryfasttree_tpu/models/_matrices_data.py`` so the framework is standalone.

Unlike the reference we do NOT ship the precomputed eigendecomposition of the
BLOSUM45 distance matrix -- we recompute it at load time with numpy (see
models/distance_matrix.py), which keeps only the irreducible data here.
"""
import re
import sys
import numpy as np

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
OUT = sys.argv[2] if len(sys.argv) > 2 else "veryfasttree_tpu/models/_matrices_data.py"


def parse_braced_numbers(text):
    """All floats inside the outermost brace block, row-major."""
    return [float(x) for x in re.findall(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", text)]


def grab_block(src, name):
    """Return the text of the initializer `::name[...] = { ... };`."""
    m = re.search(re.escape(name) + r"(?:\[[^\]]*\])+\s*=\s*\{", src)
    assert m, name
    i = m.end() - 1
    depth = 0
    for j in range(i, len(src)):
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                return src[i : j + 1]
    raise AssertionError(name)


def main():
    tm = open(f"{REF}/src/TransitionMatrix.tcc").read()
    dm = open(f"{REF}/src/DistanceMatrix.tcc").read()

    tables = {}
    for name in ["statJTT92", "statWAG01", "statLG08"]:
        vals = parse_braced_numbers(grab_block(tm, name))
        assert len(vals) == 20, (name, len(vals))
        tables[name] = np.array(vals)
    for name in ["matrixJTT92", "matrixWAG01", "matrixLG08"]:
        vals = parse_braced_numbers(grab_block(tm, name))
        assert len(vals) == 400, (name, len(vals))
        tables[name] = np.array(vals).reshape(20, 20)

    # BLOSUM45 initializer: the first 20x20 block is the distances table
    # (the rest -- eigeninv/eigenval -- we recompute ourselves).
    m = re.search(r"_matrixBLOSUM45\s*=\s*\{", dm)
    assert m
    body = dm[m.end() - 1 :]
    depth = 0
    for j, c in enumerate(body):
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                body = body[: j + 1]
                break
    vals = parse_braced_numbers(body)
    b45 = np.array(vals[:400]).reshape(20, 20)
    assert np.allclose(b45, b45.T), "BLOSUM45 distances must be symmetric"
    tables["distancesBLOSUM45"] = b45

    with open(OUT, "w") as f:
        f.write(
            '"""Published substitution-model constants (auto-extracted, see '
            'scripts/extract_model_data.py).\n\nSources: BLOSUM45 profile distances '
            "(ref src/DistanceMatrix.tcc:162-215); JTT92/WAG01/LG08\nrate matrices and "
            "stationary distributions (ref src/TransitionMatrix.tcc:284-357).\n"
            '"""\nimport numpy as np\n\n'
        )
        for name, arr in tables.items():
            f.write(f"{name} = np.array({np.array2string(arr, separator=',', threshold=10**6, floatmode='unique')})\n\n")
    print(f"wrote {OUT}: " + ", ".join(f"{k}{v.shape}" for k, v in tables.items()))


if __name__ == "__main__":
    main()
