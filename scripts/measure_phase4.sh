#!/bin/bash
# Phase 4: sweep over the example subset whose mesh shapes are already in
# the compile cache (icosphere surrogates) so all 3 congestion levels
# produce comparison tables inside the round's TPU budget; the remaining
# shapes (punctured/torus/knot/hills) need fresh ~25-min remote compiles
# and are deferred. Then hot steady-state rerun of the congestion point.
set -u
cd /root/repo
export PYTHONPATH=./${PYTHONPATH:+:$PYTHONPATH}
export PYTHONIOENCODING=utf-8
ART=artifacts/round2
mkdir -p "$ART"
STAMP() { date -u +%H:%M:%S; }

SUBSET="airplane refined_airplane armadillo refined_armadillo hand refined_hand bunny refined_bunny"

echo "[$(STAMP)] === sweep (cached shapes, 60 s/run cap) ==="
timeout 5400 make main tol=1e-4 time_limit=60 EXAMPLES="$SUBSET" \
  > "$ART/make_main.stdout" 2>&1
echo "[$(STAMP)] make main exit=$?"

echo "[$(STAMP)] === hot steady-state: congestion=0.05 flagship ==="
timeout 1500 python replication/main.py \
  --example=plane --n_space=64 --ntime=31 --nit=3000 --time_limit=600 \
  --tol=1e-4 --congestion=0.05 --log_file="$ART/congestion005_hot.log" \
  > "$ART/congestion005_hot.stdout" 2>&1
echo "[$(STAMP)] congestion hot exit=$?"

echo "[$(STAMP)] === phase 4 complete ==="
