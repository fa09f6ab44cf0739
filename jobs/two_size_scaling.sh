#!/usr/bin/env bash
# North-rule deployment protocol, literally: package the engine, run
# the SAME spark-submit job at two cluster sizes (N and 4N), diff the
# reported pages/sec. On a real cluster substitute --master URLs; in
# the sandbox the two sizes are local[N] / local[4N] (see
# BENCH/BASELINE.md for why 2->8 is the cluster-analogous pair).
#
#   jobs/two_size_scaling.sh [N] [PAGES_PARQUET]
#
# PAGES_PARQUET defaults to the bench harness's materialized 16M-page
# table (generated on first `python bench.py --scaling` run); reading
# a real columnar table keeps the measured job identical to the
# production shape instead of timing in-process synthesis.
# Prints the two metric lines and the scaling efficiency.
set -euo pipefail
N="${1:-2}"
N4=$((N * 4))
INPUT="${2:-/tmp/rhp_bench_pages_16000000}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
zip -qr /tmp/rhp_pkg_scaling.zip rhealpixdggs_spark

run() {
  local cores="$1" out="$2"
  rm -rf "$out"
  spark-submit --master "local[$cores]" --driver-memory "${DRIVER_MEM:-16g}" \
    --py-files /tmp/rhp_pkg_scaling.zip \
    jobs/grid_rollup_job.py --output "$out" --input "$INPUT" --timed-repeats 3 \
    2>/dev/null | tail -1
}

A=$(run "$N" /tmp/rhp_two_size_a)
B=$(run "$N4" /tmp/rhp_two_size_b)
echo "$A"
echo "$B"
python3 - "$A" "$B" "$N" "$REPO" <<'EOF'
import json, os, sys
a, b, n, repo = json.loads(sys.argv[1]), json.loads(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
eff = (b["pages_per_sec"] / a["pages_per_sec"]) / 4
out = {
    "protocol": "spark-submit --py-files, same job+input, two sizes",
    "n_cores": n, "n4_cores": 4 * n,
    "rate_n": a["pages_per_sec"], "rate_4n": b["pages_per_sec"],
    "scaling_efficiency": round(eff, 3),
    "runs": [a, b],
}
# Keep every prior session's result in the artifact — run-to-run
# spread is part of the committed evidence, not something a rerun
# silently replaces.
path = os.path.join(repo, "BENCH", "two_size.json")
if os.path.exists(path):
    with open(path) as f:
        prev = json.load(f)
    hist = prev.pop("history", [])
    hist.append({k: prev[k] for k in ("rate_n", "rate_4n", "scaling_efficiency") if k in prev})
    out["history"] = hist
print(json.dumps(out))
with open(path, "w") as f:
    json.dump(out, f, indent=1)
EOF
