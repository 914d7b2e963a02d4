#!/bin/bash
# Round-4 measurement queue: waits for the axon tunnel to come back, then
# runs the outstanding on-hardware measurements sequentially (never two
# jax processes at once).  Logs to /tmp/r4_queue/.
cd /root/repo || exit 1
LOG=/tmp/r4_queue
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

# 1. full on-hardware parity matrix (VERDICT item 4)
run parity python benchmarks/tpu_parity.py
# 2. fp64 end-to-end record (VERDICT item 5)
run suite19 python benchmarks/suite.py --configs 19
# 3. tile-8 256^3 toy (round-2 ask, VERDICT item 5)
run suite20 python benchmarks/suite.py --configs 20
# 4. tile-8 256^3 SI (completes the SI tile scan)
run suite18 python benchmarks/suite.py --configs 18
# 5. setup-cost profile of the 256^3 SI single-region headline config
run pf256_single python benchmarks/profile_frame.py --scene armadillo_melt_si --n 256 --untiled --segment-iters 200
# 6. setup-cost profile of the 256^3 SI tiled config
run pf256_t16 python benchmarks/profile_frame.py --scene armadillo_melt_si --n 256 --tile 16 --segment-iters 1000
echo "$(date -u +%H:%M:%S) QUEUE DONE" >> "$LOG/queue.log"
