#!/usr/bin/env python3
"""Per-query timing harness for optimization work (bench.py is frozen for
measurement; this file exists so optimization evidence can cite isolated
numbers without touching it).

Mirrors bench.py's methodology — best-of-2 `.count()` per query with the
operator persist-registry and the Spark cache cleared between reps — but
runs only the queries named on the command line, at $SPARK_GRAFT_SF_DIR,
optionally with a noop sink (guide §1.4) instead of count().

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1 q2 ...
  SPARK_GRAFT_SF_DIR=... python bench_extra.py --noop q1 ...
  python bench_extra.py --all            # every bench.py HEADLINE query
"""

from __future__ import annotations

import os

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import json  # noqa: E402
import sys  # noqa: E402
import time  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noop = "--noop" in sys.argv
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "2"))

    import __spark_entry__ as entry_mod
    from bench import HEADLINE
    from entity_extractor_by_pointer_spark.cache import release_all
    from entity_extractor_by_pointer_spark.session import get_spark

    names = HEADLINE if "--all" in sys.argv else args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    # same warm-up as bench.py: boot python workers before timing
    entry_mod.q_ner_mentions(spark, sf_dir).count()
    out: dict[str, float] = {}
    for name in names:
        best = None
        for _rep in range(reps):
            release_all()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "noop": noop, "queries": out, "total": round(sum(out.values()), 2)}))


if __name__ == "__main__":
    main()
