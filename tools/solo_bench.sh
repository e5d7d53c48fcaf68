#!/usr/bin/env bash
# Solo-medians pass (r10 verdict #6 / r11 #6): run each named query in its
# OWN fresh JVM/session at the given SF dir, reps per query, and merge the
# per-query medians+spreads into one artifact. Solo numbers separate a
# query's intrinsic cost from in-suite session debris (the ann_pq 16-66 s
# in-suite spread class).
#
# Usage: tools/solo_bench.sh <sfdir> <out.json> <reps> q1 q2 q3 ...
set -u
SF="$1"; OUT="$2"; REPS="$3"; shift 3
TMPD=$(mktemp -d)
for q in "$@"; do
  echo "=== solo $q ===" >&2
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_REPS="$REPS" \
    SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_BENCH_OUT="$TMPD/$q.json" \
    sbt -batch "runMain graft.Bench" >/dev/null 2>&1
done
python3 - "$SF" "$OUT" "$REPS" "$TMPD" "$@" <<'EOF'
import json, sys, glob, os
sf, out, reps, tmpd = sys.argv[1:5]
names = sys.argv[5:]
merged = {"protocol": "solo", "reps": int(reps), "sf": sf,
          "queries": {}, "queries_min": {}, "queries_max": {},
          "operator_s": {}, "referee_s": {}, "errors": {}, "commit": None}
for q in names:
    p = os.path.join(tmpd, f"{q}.json")
    if not os.path.exists(p):
        merged["errors"][q] = "no artifact (bench run failed)"
        continue
    art = json.load(open(p))
    merged["commit"] = art.get("commit")
    for k in ("queries", "queries_min", "queries_max", "operator_s", "referee_s"):
        merged[k].update(art.get(k, {}))
    merged["errors"].update(art.get("errors", {}))
json.dump(merged, open(out, "w"), indent=None, separators=(",", ":"))
print(f"wrote {out}: {len(merged['queries'])} queries, errors={merged['errors']}")
EOF
rm -rf "$TMPD"
