#!/bin/bash
# Strong-scaling (core-scaling) study: run a fixed key set at sf1 across
# local[4|8|16|32] and report per-key wall medians. The 1000-executor
# question asked directly: does each plan convert cores into wall-clock,
# or is a stage serialized? Results land in PERF.md (r15).
#
# Usage: tools/corescale.sh <sfdir> <out_prefix> [keys]
set -u
SFDIR="${1:-/tmp/graft_scale/sf1}"
OUT="${2:-/tmp/corescale}"
KEYS="${3:-graph_label_propagation,graph_shortest_hops,dedup_semantic,dedup_minhash_lsh,recs_item_neighbors,mine_hard_negatives,sim_topk_cosine,agg_groupby_pricing,join_multiway_star,stream_session_5m}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
cd /root/repo
for C in 4 8 16 32; do
  echo "[corescale] cores=$C"
  SPARK_GRAFT_CPUS=$C SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_BENCH_KEYS="$KEYS" \
    java -XX:+IgnoreUnrecognizedVMOptions -XX:ReservedCodeCacheSize=2g $ADD_OPENS \
    -Xmx48g -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
    > "${OUT}_c${C}.log" 2>&1
  cp bench.json "${OUT}_c${C}.json" 2>/dev/null
done
python3 - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
cores = [4, 8, 16, 32]
data = {}
for c in cores:
    with open(f"{out}_c{c}.json") as f:
        data[c] = json.load(f)["queries"]
keys = sorted(data[4], key=lambda k: -data[4][k])
print(f"{'key':34s} " + "".join(f"{'c'+str(c):>8s}" for c in cores) + f"{'S(32/4)':>9s}{'E(32)':>7s}")
for k in keys:
    t = [data[c][k] for c in cores]
    s = t[0] / t[3] if t[3] else float('nan')
    e = s / 8.0
    print(f"{k:34s} " + "".join(f"{x:8.2f}" for x in t) + f"{s:9.2f}{e:7.2f}")
tot = [sum(data[c].values()) for c in cores]
print(f"{'TOTAL':34s} " + "".join(f"{x:8.2f}" for x in tot) + f"{tot[0]/tot[3]:9.2f}{tot[0]/tot[3]/8:7.2f}")
EOF
