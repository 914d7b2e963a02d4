#!/bin/bash
# Round-5 measurement queue: drains the remaining on-hardware records
# sequentially (never two jax processes at once).  Logs to /tmp/r5_queue/.
cd /root/repo || exit 1
LOG=/tmp/r5_queue
mkdir -p "$LOG"

probe() {
  timeout 150 python -c "import jax, jax.numpy as jnp; print(jnp.ones((8,8)).sum())" >/dev/null 2>&1
}

echo "$(date -u +%H:%M:%S) waiting for tunnel" >> "$LOG/queue.log"
until probe; do
  echo "$(date -u +%H:%M:%S) tunnel down, retry in 180s" >> "$LOG/queue.log"
  sleep 180
done
echo "$(date -u +%H:%M:%S) tunnel up" >> "$LOG/queue.log"

run() {
  name=$1; shift
  echo "$(date -u +%H:%M:%S) START $name" >> "$LOG/queue.log"
  timeout 10800 "$@" > "$LOG/$name.log" 2>&1
  echo "$(date -u +%H:%M:%S) END $name rc=$?" >> "$LOG/queue.log"
}

# 1. warm-frame SI A/B at head (VERDICT items 1a + 3): setup cut + windowed
#    advection should move both solve_wall and the frame overhead
run frames_si python benchmarks/frames_ab.py --scene jelly_jam_si --n 128 \
    --frames 6 --configs uniform,tiled,single --out FRAMES_AB_SI.json
# 2. headline bench at head (single/untiled) + the tiled-at-head series point
run bench_single python bench.py
run bench_tiled env BENCH_CONFIG=tiled python bench.py
# 3. fp64 end-to-end record (config 19, own process: x64 flip is global)
run suite19 python benchmarks/suite.py --configs 19
# 4. crop toy 256^3 records (configs 24/25)
run suite24_25 python benchmarks/suite.py --configs 24,25
# 5. SI tile-8 256^3 (config 18)
run suite18 python benchmarks/suite.py --configs 18
# 6. toy tile-8 256^3 (config 20)
run suite20 python benchmarks/suite.py --configs 20
# 7. on-hardware parity matrix at head (shard_map apply landed since r4 run)
run parity python benchmarks/tpu_parity.py
echo "$(date -u +%H:%M:%S) QUEUE DONE" >> "$LOG/queue.log"
