#!/bin/bash
# Interactive r4 perf sweep (run between campaign parts; ~25 min on the
# chip).  Records schedule A/Bs + batched-stream aggregate with trained
# weights into results/.
set -x
cd /root/repo
RES=results
mkdir -p $RES

# headline candidates with trained weights (gop first-wins is default)
timeout 1500 python bench.py --frames 8 > $RES/bench_r4_default.json 2> $RES/bench_r4_default.err
timeout 1200 python bench.py --frames 8 --schedule no_lookahead --no-iframe \
  > $RES/bench_r4_serialish.json 2>/dev/null
timeout 1200 python bench.py --frames 8 --schedule gop_pipeline --gop 8 --no-iframe \
  > $RES/bench_r4_gop8.json 2>/dev/null

# batched streams: aggregate throughput (VERDICT r3 item 6)
timeout 1500 python bench.py --frames 8 --batch 2 --gop 4 --no-iframe \
  > $RES/bench_r4_b2.json 2> $RES/bench_r4_b2.err

# gather probes backing the warp-kernel analysis (ARCHITECTURE item 7)
timeout 1200 python bench_gather.py > $RES/bench_gather_r4.txt 2>&1

echo SWEEP_DONE
