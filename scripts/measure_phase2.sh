#!/bin/bash
# Phase 2: corrected-timing benches first (quick), then the full sweep,
# then hot-cache steady-state reruns of the protocol points.
set -u
cd /root/repo
export PYTHONPATH=./${PYTHONPATH:+:$PYTHONPATH}
export PYTHONIOENCODING=utf-8
ART=artifacts/round2
mkdir -p "$ART"
STAMP() { date -u +%H:%M:%S; }

echo "[$(STAMP)] === A. bench.py (fixed differencing methodology) ==="
timeout 2400 python bench.py > "$ART/bench_flagship.json" 2> "$ART/bench_flagship.stderr"
echo "[$(STAMP)] bench.py exit=$?"

echo "[$(STAMP)] === B. large-mesh CG benches, corrected timing ==="
timeout 3600 python scripts/bench_large.py --n_space 200 --iters 200 \
  > "$ART/bench_large_v46k.json" 2> "$ART/bench_large_v46k.stderr"
echo "[$(STAMP)] bench_large 46k exit=$?"
timeout 3600 python scripts/bench_large.py --n_space 290 --iters 100 \
  > "$ART/bench_large_v97k.json" 2> "$ART/bench_large_v97k.stderr"
echo "[$(STAMP)] bench_large 97k exit=$?"

echo "[$(STAMP)] === C. full replication sweep (make main, tol=1e-4) ==="
timeout 10800 make main tol=1e-4 > "$ART/make_main.stdout" 2>&1
echo "[$(STAMP)] make main exit=$?"

echo "[$(STAMP)] === D. hot-cache steady-state protocol points ==="
timeout 1200 python replication/main.py \
  --example=plane --n_space=50 --ntime=127 --nit=10000 --time_limit=900 \
  --tol=1e-4 --log_file="$ART/ntime127_hot.log" \
  > "$ART/ntime127_hot.stdout" 2>&1
echo "[$(STAMP)] ntime127 hot exit=$?"
timeout 1200 python replication/main.py \
  --example=plane --n_space=64 --ntime=31 --nit=10000 --time_limit=900 \
  --tol=1e-4 --congestion=0.05 --log_file="$ART/congestion005_hot.log" \
  > "$ART/congestion005_hot.stdout" 2>&1
echo "[$(STAMP)] congestion hot exit=$?"

echo "[$(STAMP)] === phase 2 complete ==="
