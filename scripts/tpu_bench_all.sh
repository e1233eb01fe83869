#!/bin/bash
# TPU bench battery — run when the axon tunnel is healthy.
#
# Produces (committed under benchmarks/):
#   bench.py                       -> headline fused top-k (bf16/int8/int4)
#   scripts/bench_scale.py         -> 10M-row int8 + IVF lanes
#   scripts/bench_scale.py --int4  -> 10M-row int4 packed lane
#   scripts/bench_streaming.py     -> idle vs during-build percentiles
#
# Every script degrades to a parseable JSON line on CPU if the tunnel is
# down (youtu_rag_tpu/utils/devices.resolve_backend) — rc stays 0.
set -x
cd "$(dirname "$0")/.."
mkdir -p benchmarks

timeout 900 python bench.py 2>&1 | tail -1 | tee benchmarks/bench_main_last.json
timeout 2400 python scripts/bench_scale.py 2>&1 | tail -1
timeout 1200 python scripts/bench_streaming.py 2>&1 | tail -1
timeout 900 python scripts/bench_embedder.py 2>&1 | tail -1
timeout 900 python scripts/bench_decoder.py 2>&1 | tail -1
# bench_chat needs the committed chat-LM checkpoint; skip cleanly if absent
[ -d benchmarks/models/yrt_tiny_chat ] && timeout 900 python scripts/bench_chat.py 2>&1 | tail -1
