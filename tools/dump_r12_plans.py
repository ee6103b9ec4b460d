"""Dump .explain("formatted") for named queries to plans/r12/<query>_<tag>.txt.

    python tools/dump_r12_plans.py <tag> [--sf SF_DIR] [--repo REPO] name...

``tag`` is e.g. ``before`` / ``after``; ``--repo`` points at the source
tree to import (a worktree of the pre-change commit for ``before``).
Streaming run-to-completion queries: the captured plan is the
batch-side plan of the RESULT (the memory-sink table read) -- the
micro-batch plan itself is not explainable post-hoc; their evidence
lives in STREAMING_BATCHES.json per-batch work rows instead.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--out", default="/root/repo/plans/r12")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from big_data_co2_emission_analysis_spark.plans.inspect import explain_formatted
    from big_data_co2_emission_analysis_spark.queries import all_queries
    from big_data_co2_emission_analysis_spark.session import get_session

    spark = get_session("dump_r12_plans")
    spark.range(10).count()
    qs = all_queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        df = qs[name].fn(spark, args.sf)
        plan = explain_formatted(df)
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} -- explain('formatted') at {args.sf}, tag={args.tag}\n"
                f"# source tree: {args.repo}\n\n"
            )
            f.write(plan)
        print(f"wrote {path} ({len(plan)} B)", file=sys.stderr)
        # release anything the builder eagerly checkpointed
        spark.catalog.clearCache()
        try:
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist(False)
        except Exception:
            pass


if __name__ == "__main__":
    main()
