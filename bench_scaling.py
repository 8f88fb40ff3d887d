"""Scaling-efficiency evidence (BASELINE.json north_rule): run the SAME
validation job on the SAME materialized input at two parallelism levels
(local[8] = N cores, local[32] = 4N cores — the sandbox stand-in for N vs
4N executor clusters) and report throughput at both plus efficiency
throughput(4N) / (4 * throughput(N)).

Each level runs in its own JVM (subprocess) so executor-thread pools,
memory fractions, and shuffle partitioning are configured per level, like
separate cluster submissions via spark-submit. Writes BENCH/BASELINE.md.

Usage: python bench_scaling.py [--rows 4000000] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(here)r)
from pyspark.sql import functions as F
from schema_fantasy_spark.engine import ValidationEngine
from schema_fantasy_spark.session import get_spark
from schema_fantasy_spark.sources.pages import PAGES_SCHEMA, pages

cores = int(sys.argv[1]); path = sys.argv[2]; runs = int(sys.argv[3])
spark = get_spark(app_name=f"sfs-scaling-{cores}", cores=cores,
                  shuffle_partitions=max(cores, 16))
spark.sparkContext.setLogLevel("ERROR")
pdf = spark.read.parquet(path)
eng = ValidationEngine(PAGES_SCHEMA)
# full-size untimed warm-up: JIT-compiles the whole codegen path and warms
# the OS page cache, so timed runs measure steady-state throughput
eng.apply(pdf).agg(F.sum(F.col("verdict").cast("long"))).collect()
times = []
for _ in range(runs):
    t0 = time.time()
    agg = eng.apply(pdf).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("verdict")).cast("long")).alias("n_invalid"),
        F.sum(F.size("errors")).alias("n_errors"),
    ).collect()[0]
    times.append(time.time() - t0)
print(json.dumps({"cores": cores, "times": times, "n": agg["n"],
                  "n_invalid": agg["n_invalid"]}), flush=True)
spark.stop()
"""


def materialize(rows: int) -> str:
    path = f"/tmp/sfs_scaling_pages_{rows}"
    if os.path.exists(path):
        return path
    code = (
        f"import sys; sys.path.insert(0, {HERE!r})\n"
        "from schema_fantasy_spark.session import get_spark\n"
        "from schema_fantasy_spark.sources.pages import pages\n"
        "s = get_spark(cores=32); s.sparkContext.setLogLevel('ERROR')\n"
        f"pages(s, {rows}, partitions=128).write.mode('overwrite').parquet({path!r})\n"
        "s.stop()\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True)
    return path


def run_level(cores: int, path: str, runs: int) -> dict:
    """One JVM per level, CPU-pinned with taskset so local[N] really has N
    cores (otherwise GC/IO threads of the 'small cluster' borrow idle cores
    and overstate throughput(N), understating scaling efficiency)."""
    cmd = [sys.executable, "-c", WORKER % {"here": HERE}, str(cores), path, str(runs)]
    try:
        subprocess.run(["taskset", "-c", "0", "true"], check=True, capture_output=True)
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    except (FileNotFoundError, subprocess.CalledProcessError):
        print("taskset unavailable; running unpinned", file=sys.stderr)
    out = subprocess.run(cmd, check=True, capture_output=True, text=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    path = materialize(args.rows)
    print(f"input: {path} ({args.rows} rows)", file=sys.stderr)
    r8 = run_level(8, path, args.runs)
    print(f"local[8]: {r8}", file=sys.stderr)
    r32 = run_level(32, path, args.runs)
    print(f"local[32]: {r32}", file=sys.stderr)

    t8 = statistics.median(r8["times"])
    t32 = statistics.median(r32["times"])
    thr8 = r8["n"] / t8
    thr32 = r32["n"] / t32
    eff = thr32 / (4 * thr8)

    result = {
        "rows": r8["n"],
        "throughput_docs_per_sec": {"local8": round(thr8, 1), "local32": round(thr32, 1)},
        "median_sec": {"local8": round(t8, 3), "local32": round(t32, 3)},
        "all_runs_sec": {"local8": r8["times"], "local32": r32["times"]},
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "meets_target": eff >= 0.8,
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling-efficiency evidence

Same job (full PAGES_SCHEMA constraint suite: required/pattern/minLength/
enum/maximum checks -> errors column -> verdict aggregate), same
materialized parquet input ({r8['n']:,} rows at {path}), two parallelism
levels, each in its own JVM. Median of {args.runs} runs after a warm-up.

| quantity | local[8] (N) | local[32] (4N) |
|---|---|---|
| median wall-clock (s) | {t8:.3f} | {t32:.3f} |
| throughput (docs/sec) | {thr8:,.0f} | {thr32:,.0f} |
| all runs (s) | {', '.join(f'{x:.3f}' for x in r8['times'])} | {', '.join(f'{x:.3f}' for x in r32['times'])} |

**Scaling efficiency** = throughput(4N) / (4 x throughput(N)) =
**{eff:.3f}** (target >= 0.8: {"MET" if eff >= 0.8 else "NOT MET"}).

Config per level: AQE on, shuffle partitions = max(cores, 16), Arrow batch
10k, maxPartitionBytes 128m (schema_fantasy_spark/session.py). Invalid rows
found: {r8['n_invalid']:,} (identical at both levels — the input is
deterministic and shared).
""")
    print("wrote BENCH/BASELINE.md", file=sys.stderr)


if __name__ == "__main__":
    main()
