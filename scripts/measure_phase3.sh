#!/bin/bash
# Phase 3: SpMV race on the real chip, then the replication sweep with a
# TPU-budget time cap (the reference protocol caps runs at 5000 s on CPU;
# we cap at 60 s per run -- tables still show iterations/time/cost), then
# hot-cache steady-state reruns.
set -u
cd /root/repo
export PYTHONPATH=./${PYTHONPATH:+:$PYTHONPATH}
export PYTHONIOENCODING=utf-8
ART=artifacts/round2
mkdir -p "$ART"
STAMP() { date -u +%H:%M:%S; }

echo "[$(STAMP)] === A. SpMV race (46k, 97k) ==="
timeout 1800 python scripts/bench_matvec.py --n_space 200 --iters 50 \
  > "$ART/matvec_v46k.json" 2> "$ART/matvec_v46k.stderr"
echo "[$(STAMP)] matvec 46k exit=$?"
timeout 1800 python scripts/bench_matvec.py --n_space 290 --iters 30 \
  > "$ART/matvec_v97k.json" 2> "$ART/matvec_v97k.stderr"
echo "[$(STAMP)] matvec 97k exit=$?"

echo "[$(STAMP)] === B. replication sweep, 60 s/run cap ==="
timeout 7200 make main tol=1e-4 time_limit=60 > "$ART/make_main.stdout" 2>&1
echo "[$(STAMP)] make main exit=$?"

echo "[$(STAMP)] === C. hot-cache steady-state protocol points ==="
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

echo "[$(STAMP)] === phase 3 complete ==="
