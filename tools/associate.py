"""Associate two timestamped recordings by nearest timestamps.

Reference analogue: `tools/evaluation/associate.py` (TUM RGB-D tooling):
reads two files whose first column is a timestamp, matches entries whose
stamps differ by at most `--max-difference` (after `--offset`), and
prints the merged lines. Used to pair rgb/depth lists or an estimated
trajectory with ground truth before ATE evaluation.

Usage:
  python tools/associate.py first.txt second.txt \
      [--offset 0.0] [--max-difference 0.02] [--first-only]
"""

import argparse


def read_file_list(path):
    """dict timestamp -> rest-of-line tokens; '#' comments skipped.
    Commas are tolerated (EuRoC csv)."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.replace(",", " ").strip()
            if not line or line.startswith("#"):
                continue
            toks = line.split()
            t = float(toks[0])
            # EuRoC nanosecond stamps -> seconds
            if t > 1e14:
                t *= 1e-9
            out[t] = toks[1:]
    return out


def associate(first, second, offset=0.0, max_difference=0.02):
    """Greedy nearest-stamp matching (same algorithm as the reference
    tool: sort all candidate pairs by |dt|, take each stamp once)."""
    cand = [
        (abs(a - (b + offset)), a, b)
        for a in first
        for b in second
        if abs(a - (b + offset)) < max_difference
    ]
    cand.sort()
    used_a, used_b, matches = set(), set(), []
    for _d, a, b in cand:
        if a not in used_a and b not in used_b:
            used_a.add(a)
            used_b.add(b)
            matches.append((a, b))
    matches.sort()
    return matches


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("first")
    p.add_argument("second")
    p.add_argument("--offset", type=float, default=0.0)
    p.add_argument("--max-difference", type=float, default=0.02)
    p.add_argument("--first-only", action="store_true",
                   help="print only matched lines of the first file")
    a = p.parse_args()
    first = read_file_list(a.first)
    second = read_file_list(a.second)
    for ta, tb in associate(first, second, a.offset, a.max_difference):
        if a.first_only:
            print(f"{ta:.6f} " + " ".join(first[ta]))
        else:
            print(
                f"{ta:.6f} " + " ".join(first[ta])
                + f" {tb:.6f} " + " ".join(second[tb])
            )


if __name__ == "__main__":
    main()
