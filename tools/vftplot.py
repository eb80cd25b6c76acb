#!/usr/bin/env python3
"""Plot CPU/memory samples from tools/prof output (equivalent of the
reference's tools/vftplot.py).

Usage: vftplot.py prof_output.tsv [out.png]
"""
import sys


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    rows = []
    with open(sys.argv[1]) as f:
        next(f)  # header
        for line in f:
            t, cpu, rss = line.split("\t")
            rows.append((float(t), float(cpu), float(rss) / 1024.0))
    if not rows:
        print("no samples")
        return 1
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        ts = [r[0] for r in rows]
        fig, ax1 = plt.subplots(figsize=(8, 4))
        ax1.plot(ts, [r[1] for r in rows], label="cpu %")
        ax1.set_xlabel("seconds")
        ax1.set_ylabel("cpu %")
        ax2 = ax1.twinx()
        ax2.plot(ts, [r[2] for r in rows], color="tab:red", label="rss MB")
        ax2.set_ylabel("rss MB")
        out = sys.argv[2] if len(sys.argv) > 2 else "prof.png"
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        print(f"wrote {out}")
    except ImportError:
        # text fallback
        print(f"{'t':>6} {'cpu%':>7} {'rssMB':>9}")
        for t, cpu, rss in rows:
            print(f"{t:6.0f} {cpu:7.1f} {rss:9.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
