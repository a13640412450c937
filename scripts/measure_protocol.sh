#!/bin/bash
# Sequential baseline-protocol measurement suite (BASELINE.json configs).
# Runs on the real TPU chip; one process at a time. Logs to artifacts/round2/.
set -u
cd /root/repo
# Append, don't clobber: the environment may register JAX backend plugins
# through PYTHONPATH (e.g. an axon_site dir).
export PYTHONPATH=./${PYTHONPATH:+:$PYTHONPATH}
export PYTHONIOENCODING=utf-8
ART=artifacts/round2
mkdir -p "$ART"
STAMP() { date -u +%H:%M:%S; }

echo "[$(STAMP)] === 1. ntime=127 mid-size mesh (plane n_space=50) ==="
timeout 2400 python replication/main.py \
  --example=plane --n_space=50 --ntime=127 --nit=10000 --time_limit=1800 \
  --tol=1e-4 --log_file="$ART/ntime127.log" \
  > "$ART/ntime127.stdout" 2>&1
echo "[$(STAMP)] ntime127 exit=$?"

echo "[$(STAMP)] === 2. congestion=0.05 perf point (plane n_space=64) ==="
timeout 2400 python replication/main.py \
  --example=plane --n_space=64 --ntime=31 --nit=10000 --time_limit=1800 \
  --tol=1e-4 --congestion=0.05 --log_file="$ART/congestion005.log" \
  > "$ART/congestion005.stdout" 2>&1
echo "[$(STAMP)] congestion exit=$?"

echo "[$(STAMP)] === 3. large-mesh CG path benches ==="
timeout 3600 python scripts/bench_large.py --n_space 200 --iters 200 \
  > "$ART/bench_large_v46k.json" 2> "$ART/bench_large_v46k.stderr"
echo "[$(STAMP)] bench_large 46k exit=$?"
timeout 3600 python scripts/bench_large.py --n_space 290 --iters 100 \
  > "$ART/bench_large_v97k.json" 2> "$ART/bench_large_v97k.stderr"
echo "[$(STAMP)] bench_large 97k exit=$?"

echo "[$(STAMP)] === 4. true_error: f64, tol=1e-5, versus exact ==="
timeout 5400 make true_error > "$ART/true_error.stdout" 2>&1
echo "[$(STAMP)] true_error exit=$?"

echo "[$(STAMP)] === 5. full replication sweep (make main, tol=1e-4) ==="
timeout 14400 make main tol=1e-4 > "$ART/make_main.stdout" 2>&1
echo "[$(STAMP)] make main exit=$?"

echo "[$(STAMP)] === suite complete ==="
