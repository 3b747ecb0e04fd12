#!/bin/bash
# Serial on-chip measurement queue for round 5.
#
# Turnkey after a container reset or relay outage: corpora are rebuilt
# INLINE when their .ready markers are missing (make_corpora.py is
# chip-free; ADVICE r04 — the old queue waited 30 min for markers nothing
# created, then '|| true'-ed into doomed runs), and steps that depend on a
# corpus hard-fail fast if the rebuild fails. One TPU process at a time
# (the relay allows only one); each step is idempotent via done-markers so
# the script can be re-launched after a crash:
#
#   nohup bash benchmarks/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
#
# Queue (VERDICT r04 item in parens):
#   1. ntu_fullscale_hybrid (#2) 2-epoch full-scale NTU search, hybrid
#                                pool+stream under the 12 GB budget
#   2. ego_fullscale_cached (#3) 2-epoch ego search with the decode-once
#                                host RAM cache
#   3. profile_ntu          (#5) xplane top-op profile of the NTU found step
#   4. bench_post           (#1) deadline-proof bench.py, folding the fresh
#                                recorded searches into the artifact
set -u
cd /root/repo
STATE=/tmp/tpu_queue_r5
mkdir -p "$STATE"

log() { echo "[$(date '+%m-%d %H:%M:%S')] $*"; }

ensure_relay() {
  until timeout 180 python -c \
      "import jax; assert jax.devices()[0].platform == 'tpu'" \
      > /dev/null 2>&1; do
    log "relay down; retrying in 160s"
    sleep 160
  done
}

# step <name> <timeout_s> <cmd...>  — run once, mark done on rc==0
step() {
  local name=$1 tmo=$2; shift 2
  if [ -f "$STATE/$name.done" ]; then log "skip $name (done)"; return 0; fi
  ensure_relay
  log "START $name: $*"
  local t0=$SECONDS
  timeout "$tmo" "$@" > "$STATE/$name.out" 2>&1
  local rc=$?
  log "END $name rc=$rc wall=$((SECONDS - t0))s"
  [ $rc -eq 0 ] && touch "$STATE/$name.done"
  return $rc
}

# ensure_corpus <marker> <make_corpora-arg> — rebuild inline if missing.
# Returns nonzero (and the caller must skip dependents) only if the
# chip-free rebuild itself fails.
ensure_corpus() {
  local marker=$1 which=$2
  if [ -f "$marker" ]; then return 0; fi
  log "corpus marker $marker missing — rebuilding inline (chip-free)"
  if ! timeout 7200 python benchmarks/make_corpora.py "$which" \
      > "$STATE/corpus_$which.out" 2>&1; then
    log "FATAL: make_corpora.py $which failed — skipping dependent steps"
    return 1
  fi
  [ -f "$marker" ]
}

log "queue r5 START"

# 1. full-scale NTU hybrid pool+stream search (VERDICT #2).
if ensure_corpus /root/ntu_fullscale/.ready ntu_fullscale; then
  # budget 6 + --remat is the validated full-scale config (R5HYB4): the
  # dev/arch phase streams batch-96 supernet backprops next to the pool, so
  # the pool must leave ~10 GB of the 16 GB chip free (hyb2/hyb3 postmortems
  # in ROUND5_STATUS.md — budgets 9.5 and 8 both OOMed at that phase).
  step ntu_fullscale_hybrid 7200 python main_darts_searchable_ntu.py \
    --datadir /root/ntu_fullscale --batchsize 96 --epochs 2 \
    --bf16_backbone --remat --device_data_cache --device_cache_budget_gb 6 \
    --steps_per_dispatch 8 --num_workers 8 --save R5HYBRID
  NTU_EXP=$(ls -dt final_exp/ntu/search-R5HYBRID-* 2>/dev/null | head -1)
  if [ -n "${NTU_EXP:-}" ] && [ -f "$STATE/ntu_fullscale_hybrid.done" ]; then
    step record_ntu 300 python benchmarks/record_search.py "$NTU_EXP" \
      --task ntu
  fi
else
  log "SKIP ntu_fullscale_hybrid (corpus unavailable)"
fi

# 2. full-scale ego search with the decode-once host RAM cache (VERDICT #3)
if ensure_corpus /root/ego_fullscale/.ready ego; then
  step ego_fullscale_cached 10800 python main_darts_searchable_ego.py \
    --datadir /root/ego_fullscale --checkpointdir /root/ego_fullscale \
    --annotation annotation.json --batchsize 96 --epochs 2 \
    --bf16_backbone --device_data_cache --steps_per_dispatch 4 \
    --num_workers 8 --host_decode_cache_gb 56 --save R5CACHED
  EGO_EXP=$(ls -dt final_exp/ego/search-R5CACHED-* 2>/dev/null | head -1)
  if [ -n "${EGO_EXP:-}" ] && [ -f "$STATE/ego_fullscale_cached.done" ]; then
    step record_ego 300 python benchmarks/record_search.py "$EGO_EXP" \
      --task ego
  fi
else
  log "SKIP ego_fullscale_cached (corpus unavailable)"
fi

# 3. xplane top-op profile of the NTU found step (VERDICT #5)
step profile_ntu 2400 python benchmarks/profile_steps.py ntu_found --steps 12

# 4. deadline-proof bench with everything folded in
BENCH_BUDGET_S=2700 step bench_post 3600 python bench.py

log "queue r5 COMPLETE"
