#!/usr/bin/env python
"""Round-7 optimization harness — per-query noop-sink isolation + plan
capture (guide §1.1/§1.4/§7.2). NOT the driver bench: ``bench.py`` is
frozen for measurement; this file exists so every optimization's
before/after evidence (seconds + ``explain("formatted")``) can be
produced at any scale factor without touching the frozen harness.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --queries d4_minhash_lsh_candidates
  python bench_extra.py --sf /root/testdata/sf0.1 --all --plans plans/r07 --tag before
  python bench_extra.py --sf /root/testdata/sf1.0 --headline --trials 3

Prints one JSON line per query to stdout (chatter on stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "q_flagship_per_turn",
    "q_flagship_assembled",
    "a1_counts_per_group",
    "j3_equi_join_chain",
    "w1_ordered_concat_per_group",
    "d1_exact_dedup",
    "d4_minhash_lsh_candidates",
    "e1_cosine_topk",
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--warm", type=int, default=1)
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>_<tag>.txt explain dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from mistral_ocr_app_spark.operators import catalog
    from mistral_ocr_app_spark.session import get_spark

    q = catalog.queries()
    if args.all:
        names = list(q)
    elif args.headline:
        names = HEADLINE
    else:
        names = args.queries or HEADLINE
    spark = get_spark(
        cores=args.cpus,
        app_name="bench_extra",
        shuffle_partitions=max(2 * args.cpus, 16),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.driver.extraJavaOptions": "-Xms16g",
        },
    )
    if args.plans:
        os.makedirs(os.path.join(REPO, args.plans), exist_ok=True)
    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = q[name](spark, args.sf)
        if args.plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            p = os.path.join(REPO, args.plans, f"{name}_{args.tag}.txt")
            with open(p, "w") as f:
                f.write(plan)
        for _ in range(args.warm):
            df.write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(args.trials):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 2))
        results[name] = min(times)
        log(f"[extra] {name}: {min(times)}s  (trials {times})")
        print(json.dumps({"query": name, "sec": min(times), "trials": times,
                          "sf": args.sf}), flush=True)
    spark.stop()
    log(f"[extra] total(min): {round(sum(results.values()), 2)}s")


if __name__ == "__main__":
    main()
