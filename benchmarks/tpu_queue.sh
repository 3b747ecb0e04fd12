#!/bin/bash
# Serial on-chip measurement queue for round 4 (companion to ROUND4_STATUS.md).
#
# The TPU relay went down mid-round; everything chip-dependent was staged.
# This script waits for the relay to return, then runs the staged queue in
# VERDICT-r03 priority order, one TPU process at a time (the relay allows
# only one). Each step is idempotent (skips if its done-marker exists), so
# the script can be re-launched after a crash or a second outage:
#
#   nohup bash benchmarks/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
#
# Queue (VERDICT r03 item in parens):
#   1. bisect_bf16        (#1b) bf16 MM-IMDB regression: AOT-vs-jit x part-vs-mask
#   2. bench_pre          (#1a) full bench.py under the rewritten single-roof MFU
#   3. poolfit_pool       (#2)  NTU search, train frame pool resident in HBM
#   4. poolfit_stream     (#2)  same corpus/flags, train split streaming
#   5. grouped_probe      (#4)  ResNeXt grouped-vs-dense conv decision data
#   5b. ntu_remat_probe   (#4)  is remat even needed at NTU found batch 48?
#   6. ego_fullscale      (#3)  measured EgoGesture-scale search wall-clock
#   7. profile_{ego,ntu}  (#4)  xplane top-op analyses of the video steps
#   8. bench_post         (#1)  bench.py again, folding the recorded searches
set -u
cd /root/repo
STATE=/tmp/tpu_queue
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

log "waiting for relay"
ensure_relay
log "relay UP — starting queue"

# 1. bisect the bf16 MM-IMDB bench regression (VERDICT #1b)
step bisect_bf16 2400 python benchmarks/bisect_bf16.py

# 2. full bench under the rewritten MFU accounting (VERDICT #1a/c/d)
step bench_pre 7200 python bench.py

# The measurement corpora live outside the repo and die with the container
# (that happened mid-round — ROUND4_STATUS.md). benchmarks/make_corpora.py
# rebuilds them and drops .ready markers; wait for those here.
wait_ready() {
  local marker=$1 tries=0
  until [ -f "$marker" ]; do
    tries=$((tries + 1))
    if [ $tries -gt 90 ]; then log "GAVE UP waiting for $marker"; return 1; fi
    log "waiting for $marker"
    sleep 20
  done
}
wait_ready /root/ntu_poolfit/.ready || true

# 3+4. NTU pool-vs-stream on the pool-fit corpus (VERDICT #2). Both runs
# cache the deterministic dev split; the budget knob isolates the train
# frame pool (pool ~3.7 GB > 2.5 budget => streams in the control run).
NTU_FLAGS=(--datadir /root/ntu_poolfit --batchsize 96 --epochs 4
           --bf16_backbone --steps_per_dispatch 8 --num_workers 8
           --device_data_cache)
step poolfit_pool 5400 python main_darts_searchable_ntu.py \
  "${NTU_FLAGS[@]}" --device_cache_budget_gb 10 --save POOLFITPOOL
step poolfit_stream 7200 python main_darts_searchable_ntu.py \
  "${NTU_FLAGS[@]}" --device_cache_budget_gb 2.5 --save POOLFITSTREAM

POOL_EXP=$(ls -dt final_exp/ntu/search-POOLFITPOOL-* 2>/dev/null | head -1)
STREAM_EXP=$(ls -dt final_exp/ntu/search-POOLFITSTREAM-* 2>/dev/null | head -1)
if [ -n "${POOL_EXP:-}" ] && [ -n "${STREAM_EXP:-}" ]; then
  step record_pool 300 python benchmarks/record_pool_compare.py \
    "$POOL_EXP" "$STREAM_EXP"
fi

# 5. grouped-vs-dense conv probe decides the ego run's execution plan
step grouped_probe 2400 python benchmarks/grouped_conv_probe.py

# 5b. does batch-48 NTU found even need remat? (ROOFLINE.md finding 4:
# block remat bakes ~+33% forward recompute into the 480 ms step)
step ntu_remat_probe 3600 python benchmarks/ntu_remat_probe.py

DENSE_FLAG=()
if [ -f "$STATE/grouped_probe.done" ]; then
  if python - "$STATE/grouped_probe.out" <<'EOF'
import json, sys
row = [l for l in open(sys.argv[1]) if l.strip().startswith("{")][-1]
d = json.loads(row)
g, de = d.get("ego_step_grouped_sps"), d.get("ego_step_dense_sps")
sys.exit(0 if (g and de and de > 1.03 * g) else 1)
EOF
  then
    DENSE_FLAG=(--dense_grouped_convs)
    log "grouped probe: dense wins — ego run gets --dense_grouped_convs"
  else
    log "grouped probe: grouped stays (dense not >3% faster)"
  fi
fi

# 6. measured EgoGesture-scale search (VERDICT #3); fall back to streaming
# dev/test if the HBM cache OOMs (rc!=0 and not a timeout)
wait_ready /root/ego_fullscale/.ready || true
EGO_FLAGS=(--datadir /root/ego_fullscale --checkpointdir /root/ego_fullscale
           --annotation annotation.json --batchsize 96 --epochs 2
           --bf16_backbone --steps_per_dispatch 4 --num_workers 8
           "${DENSE_FLAG[@]}")
step ego_fullscale 16200 python main_darts_searchable_ego.py \
  "${EGO_FLAGS[@]}" --device_data_cache --save FULLSCALE
rc=$?
if [ $rc -ne 0 ] && [ $rc -ne 124 ] && [ ! -f "$STATE/ego_fullscale.done" ]; then
  log "ego cached run failed (rc=$rc) — retrying without --device_data_cache"
  step ego_fullscale_stream 16200 python main_darts_searchable_ego.py \
    "${EGO_FLAGS[@]}" --save FULLSCALE
fi

EGO_EXP=$(ls -dt final_exp/ego/search-FULLSCALE-* 2>/dev/null | head -1)
if [ -n "${EGO_EXP:-}" ]; then
  step record_ego 300 python benchmarks/record_search.py "$EGO_EXP" --task ego
fi

# 7. xplane profiles of the video steps (VERDICT #4)
step profile_ego 2400 python benchmarks/profile_steps.py ego_search --steps 12
step profile_ntu 2400 python benchmarks/profile_steps.py ntu_found --steps 12

# 8. bench again with the recorded searches folded in
step bench_post 7200 python bench.py

log "queue COMPLETE"
