#!/bin/bash
# Round-5c follow-up queue: the coefficient-precision lever (bf16) on the
# production (unfused-update) loop.  Run AFTER run_queue_r5b.sh finishes.
cd /root/repo || exit 1
LOG=/tmp/r5_queue
mkdir -p "$LOG"

probe() {
  timeout 150 python -c "import jax, jax.numpy as jnp; print(jnp.ones((8,8)).sum())" >/dev/null 2>&1
}

until probe; do
  echo "$(date -u +%H:%M:%S) tunnel down, retry in 180s" >> "$LOG/queue.log"
  sleep 180
done

run() {
  name=$1; shift
  echo "$(date -u +%H:%M:%S) START $name" >> "$LOG/queue.log"
  timeout 10800 "$@" > "$LOG/$name.log" 2>&1
  echo "$(date -u +%H:%M:%S) END $name rc=$?" >> "$LOG/queue.log"
}

# 1. per-iteration rows incl. the new unfused-bf16 + fused-expand A/B
run iter_untiled_c python benchmarks/bench_iter.py 128 --untiled
# 2. does bf16 survive the iteration-count test at SI parameters?
run bf16_si python benchmarks/bf16_ab.py --scene jelly_jam_si --n 128 \
    --configs uniform,single,tiled --out BF16_AB_SI.json
# 3. and in the toy-stiffness regime (the round-3 non-win's conditions)
run bf16_toy python benchmarks/bf16_ab.py --scene honey_coil --n 128 \
    --configs uniform,single --out BF16_AB_TOY.json
# 4. variance check: the uniform/solid configs measured 15-47% slower at
#    head than their r3 records (suite_head_64/128) — re-measure to split
#    tunnel variance from a real rounds-4/5 regression (post-channel-trim
#    code: uniform now reads a 14-channel coeff stack)
run suite_recheck python benchmarks/suite.py --configs 1,4,6
echo "$(date -u +%H:%M:%S) QUEUE-C DONE" >> "$LOG/queue.log"
