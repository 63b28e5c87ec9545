"""Per-family scaling exponents from two bench JSONs at different SFs.

For each query present in both runs, alpha = ln(t_hi/t_lo) / ln(ratio)
— the empirical growth exponent (1.0 = linear, 0 = flat/overhead-bound,
2.0 = quadratic). Queries faster than the overhead floor (default
0.5 s at the HIGH sf) are reported as "overhead-bound" rather than
given a meaningless exponent. Prints a per-family table (family =
query-name prefix) and the worst per-query exponents.

Usage: python tools/scale_exponents.py lo.json hi.json ratio [floor_s]
"""

from __future__ import annotations

import json
import math
import sys


def family(name: str) -> str:
    for p in (
        "graph_", "embedding_", "multimodal_", "text_", "dedup_", "events_",
        "agg_", "scalar_", "window_", "join_", "asof_", "set_", "sample_",
        "skew_", "q", "stream", "orders_", "customer_", "part_", "docs_",
        "training_", "layout_", "kmv_", "minhash_", "simhash_", "ngram_",
    ):
        if name.startswith(p):
            return p.rstrip("_") or p
    return "other"


def main() -> None:
    lo = json.load(open(sys.argv[1]))["queries"]
    hi = json.load(open(sys.argv[2]))["queries"]
    ratio = float(sys.argv[3])
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    rows = []
    for k in sorted(lo):
        if k not in hi or lo[k] <= 0 or hi[k] <= 0:
            continue
        if hi[k] < floor:
            rows.append((k, lo[k], hi[k], None))
            continue
        rows.append((k, lo[k], hi[k], math.log(hi[k] / max(lo[k], 0.05)) / math.log(ratio)))
    fams: dict[str, list] = {}
    for k, tl, th, a in rows:
        fams.setdefault(family(k), []).append((k, tl, th, a))
    print(f"{'family':<12} {'n':>3} {'lo_sum':>8} {'hi_sum':>8} {'max_alpha':>9}")
    for f in sorted(fams):
        rs = fams[f]
        alphas = [a for *_, a in rs if a is not None]
        print(
            f"{f:<12} {len(rs):>3} {sum(r[1] for r in rs):>8.1f} "
            f"{sum(r[2] for r in rs):>8.1f} "
            f"{(max(alphas) if alphas else float('nan')):>9.2f}"
        )
    print("\nworst per-query exponents (alpha, lo_s, hi_s):")
    worst = sorted((r for r in rows if r[3] is not None), key=lambda r: -r[3])
    for k, tl, th, a in worst[:15]:
        print(f"  {k:<42} {a:>5.2f}  {tl:>6.2f} -> {th:>7.2f}")
    n_over = sum(1 for r in rows if r[3] is None)
    print(f"\noverhead-bound (hi < {floor}s): {n_over} queries")


if __name__ == "__main__":
    main()
