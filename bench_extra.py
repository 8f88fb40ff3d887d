"""Round-9 optimization harness (bench.py is FROZEN for measurement —
this file carries the extra instrumentation the optimization round
needs; cite its numbers in OPTIMIZATION_r09.md).

Usage:
  python bench_extra.py q1 q2 ...      # time the named queries (min of N)
  python bench_extra.py --all          # every declared query
  --plans DIR    also write .explain("formatted") to DIR/<name>_<tag>.txt
  --tag TAG      suffix for plan files (before/after; default none)
  --runs N       runs per query (default 3, min kept)
  --sf DIR       data dir (default $SPARK_GRAFT_SF_DIR or sf0.1)

Methodology matches bench.py exactly: each run re-invokes the query
builder (so driver-side plan construction is timed, as the frozen
harness does) and materializes through the noop sink.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    runs_n = 3
    plans_dir = None
    tag = ""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    take_all = False
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs_n = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif a == "--tag":
            tag = "_" + args[i + 1]; i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--all":
            take_all = True; i += 1
        else:
            names.append(a); i += 1

    import __spark_entry__ as entrymod
    from schema_fantasy_spark.session import get_spark

    qs = entrymod.queries()
    if take_all:
        names = list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="sfs-bench-extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    with open("/proc/loadavg") as f:
        load = f.read().split()[:3]
    print(f"# sf={sf_dir} cores={cpus} runs={runs_n} loadavg={load}",
          file=sys.stderr)

    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        times = []
        for _ in range(runs_n):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        out[name] = round(min(times), 3)
        print(f"{name}: runs={['%.2f' % t for t in times]} -> {min(times):.2f}s",
              file=sys.stderr, flush=True)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}{tag}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": sf_dir, "runs_per_query": runs_n,
                      "loadavg_at_start": load, "queries": out},
                     separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
