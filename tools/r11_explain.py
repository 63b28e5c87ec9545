"""Dump full .explain("formatted") for the round-11-touched queries.

Usage: python tools/r11_explain.py <suffix> <out_dir> [sf_dir] [query ...]

Writes <out_dir>/<query>_<suffix>.txt — the judge checks plan claims in
OPTIMIZATION_r11.md against these files, so keep the complete formatted
output (operator tree + per-node details incl. PushedFilters/ReadSchema).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

# Resolve the repo root from this file so the tool works from any cwd
# (ADVICE r11: the bare "." insert depended on being run from the root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfl_realtime_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tfl_realtime_lakehouse_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "text_crossdoc_span_dedup",
    "semantic_dedup_prune",
    "semantic_dedup_recall_eval",
    "dedup_cluster_resolution",
    "minhash_lsh_candidates",
    "dedup_minhash_recall_eval",
    "ngram_jaccard_pairs",
    "text_containment_pairs",
    "events_poisson_bootstrap_ci",
    "doc_winnowing_fingerprints",
]


def main() -> None:
    suffix = sys.argv[1]
    out_dir = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    queries = sys.argv[4:] or DEFAULT_QUERIES
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for name in queries:
            df = REGISTRY[name].fn(spark, sf_dir)
            # Public API: capture df.explain()'s stdout instead of
            # reaching into the py4j internals (ADVICE r11 — the
            # PythonSQLUtils path was private and version-brittle).
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print("wrote", path)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
