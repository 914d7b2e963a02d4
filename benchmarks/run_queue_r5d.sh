#!/bin/bash
# Round-5d queue: the warm-frame test of the bf16-coefficient lever.
# Waits for run_queue_r5c.sh to finish (QUEUE-C DONE in the log), then
# measures the SI 128^3 warm-frame A/B with bf16 coefficient storage —
# the direct test of ROADMAP open item 1 (single-region solve wall
# 0.64 s vs uniform 0.56 s at 128^3 despite 0.59x the iterations).
cd /root/repo || exit 1
LOG=/tmp/r5_queue
mkdir -p "$LOG"

until grep -q "QUEUE-C DONE" "$LOG/queue.log" 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "$(date -u +%H:%M:%S) START $name" >> "$LOG/queue.log"
  timeout 10800 "$@" > "$LOG/$name.log" 2>&1
  echo "$(date -u +%H:%M:%S) END $name rc=$?" >> "$LOG/queue.log"
}

# warm-frame A/B at SI 128^3: single-region with bf16 coefficients vs
# uniform (f32) — does the halved coefficient stream close the 0.08 s gap?
run frames_si_bf16 python benchmarks/frames_ab.py --scene jelly_jam_si --n 128 \
    --configs single --bf16-coeffs --out FRAMES_AB_SI_BF16.json
echo "$(date -u +%H:%M:%S) QUEUE-D DONE" >> "$LOG/queue.log"
