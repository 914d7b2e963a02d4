#!/bin/bash
# Round-5e queue (replaces the tail of r5c + r5d after the bf16_ab
# gravity-kick fix): SI bf16 A/B first (the open-item-1 decision record),
# then the uniform-config variance recheck, then the toy-regime bf16 A/B,
# then the warm-frame bf16 run.  Serial — never two jax processes.
cd /root/repo || exit 1
LOG=/tmp/r5_queue
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "$(date -u +%H:%M:%S) START $name" >> "$LOG/queue.log"
  timeout 10800 "$@" > "$LOG/$name.log" 2>&1
  echo "$(date -u +%H:%M:%S) END $name rc=$?" >> "$LOG/queue.log"
}

run bf16_si python benchmarks/bf16_ab.py --scene jelly_jam_si --n 128 \
    --configs uniform,single,tiled --out BF16_AB_SI.json
run suite_recheck python benchmarks/suite.py --configs 1,4,6
run bf16_toy python benchmarks/bf16_ab.py --scene honey_coil --n 128 \
    --configs uniform,single --out BF16_AB_TOY.json
run frames_si_bf16 python benchmarks/frames_ab.py --scene jelly_jam_si --n 128 \
    --configs single --bf16-coeffs --out FRAMES_AB_SI_BF16.json
echo "$(date -u +%H:%M:%S) QUEUE-E DONE" >> "$LOG/queue.log"
