#!/usr/bin/env python3
"""Aggregate ClusterBench JSON lines into BENCH/CLUSTER.md.

Driver-side tooling only (python3 is not a library dependency): reads the
results.jsonl that scripts/cluster_bench.sh collected from the interleaved
spark-submit rounds and writes the measured report.
"""
import json
import sys

results_path, out_path, sf_dir, rounds = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]

levels = {}  # executors -> list of per-run dicts
rows = None
for line in open(results_path):
    line = line.strip()
    if not line:
        continue
    r = json.loads(line)["cluster_bench"]
    levels.setdefault(r["executors"], []).append(r)
    rows = r["rows"]

if sorted(levels) != [2, 8]:
    sys.exit(f"expected runs at 2 and 8 executors, got {sorted(levels)}: "
             "see /tmp/cluster/run_*.log")

best = {n: min(run["wall_best"] for run in rs) for n, rs in levels.items()}
thr = {n: rows / w for n, w in best.items()}
eff = thr[8] / (4.0 * thr[2])

all_walls = {n: sorted(w for run in rs for w in run["walls"])
             for n, rs in levels.items()}

md = f"""# BENCH/CLUSTER — multi-executor standalone cluster scaling
(written by scripts/cluster_bench.sh + graft.tools.ClusterBench, not by hand)

North_rule clause: "run via spark-submit on a multi-executor cluster at two
cluster sizes (N and 4N executors) with throughput scaling efficiency >=0.8".
This sandbox has one box, so the cluster is Spark STANDALONE on localhost:
a master + one 8-core worker, with the job submitted through real
`spark-submit --master spark://127.0.0.1:7077`. Each executor is a separate
single-core JVM with its own 6g heap; every shuffle crosses process
boundaries through netty with real row serialization — the three things
`local[n]` thread-mode skips. Single-core executors keep both levels in the
compute-bound regime (the faithful stand-in for adding cluster NODES; past
~8 total cores one box saturates its shared DRAM bandwidth, which a real 4x
node count does not share — see BENCH/BASELINE.md).

Job: the identical end-to-end sketch->cluster pipeline graft.Bench measures
(`Bench.pipelineE2E`: 128-perm MinHash + SimHash signatures -> banded LSH
salted join -> exact confirm -> connected-components clustering ->
per-partition HLL lineage metrics), identical corpus ({rows} rows,
`{sf_dir}` config), corpus generation and JIT warmup (an sf0.001 pass
in-session) excluded from every timed window.

Protocol: {rounds} INTERLEAVED rounds (each round submits the 2-executor
then the 8-executor app back-to-back); inside each app, warm best-of-2;
per-level minimum across rounds — identical reasoning to the local
protocol in BENCH/BASELINE.md (one-sided VM noise; interleaving keeps a
sustained noisy window from skewing one level's minimum).

Cluster sizing (scripts/cluster_bench.sh): three confs give the packed-
onto-one-box cluster what a real containerized cluster gets for free —
(1) worker `SPARK_LOCAL_DIRS` points at the same tmpfs the local-mode
bench uses (standalone executors IGNORE `--conf spark.local.dir`; the
default is disk-backed /tmp, which taxes the higher-shuffle-rate 8-exec
level disproportionately); (2) `-XX:ActiveProcessorCount=1` per executor
JVM, matching a cpuset-limited 1-core container (unpinned, each of the 8
JVMs sizes GC/JIT/netty pools for all 32 host cores); (3)
`spark.locality.wait=0` — every executor is on one host, so the 3s
process-local wait for persisted blocks is pure idle latency.

| cluster size | executors x cores | wall best (s) | throughput (images/s) | all timed walls (s) |
|---|---|---|---|---|
| N | 2 x 1-core JVMs | {best[2]:.2f} | {thr[2]:.0f} | {", ".join(f"{w:.1f}" for w in all_walls[2])} |
| 4N | 8 x 1-core JVMs | {best[8]:.2f} | {thr[8]:.0f} | {", ".join(f"{w:.1f}" for w in all_walls[8])} |

**scaling_efficiency (N=2 -> 4N=8 executors) = {eff:.3f}** (target >= 0.8)
"""
with open(out_path, "w") as f:
    f.write(md)
print(f"wrote {out_path}: eff={eff:.3f} walls n2={best[2]:.2f} n8={best[8]:.2f}")
