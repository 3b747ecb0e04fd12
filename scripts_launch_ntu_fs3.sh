#!/bin/bash
# Full-scale NTU search, measured end-to-end (BENCH_r03 ntu_search_minutes).
cd /root/repo
nohup timeout 28000 python main_darts_searchable_ntu.py \
  --datadir /root/ntu_fullscale \
  --batchsize 96 --epochs 30 --bf16_backbone \
  --device_data_cache --steps_per_dispatch 8 \
  --num_workers 8 --save FULLSCALE3 \
  > /tmp/ntu_fs3.log 2>&1 &
echo $! > /tmp/ntu_search.pid
echo "launched pid $(cat /tmp/ntu_search.pid)"
