#!/bin/bash
# Round-5 follow-up queue: production-scale warm frames + per-iteration
# breakdowns at head.  Run AFTER run_queue_r5.sh finishes.
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

# 1. warm frames at production scale (the paper's own armadillo regime):
#    single-region reduced vs uniform at SI 256^3
run frames_si_256 python benchmarks/frames_ab.py --scene armadillo_melt_si --n 256 \
    --frames 6 --configs uniform,single --out FRAMES_AB_SI_256.json
# 2. the same with solve-domain cropping (both configs gain; records the
#    production posture)
run frames_si_256_crop python benchmarks/frames_ab.py --scene armadillo_melt_si --n 256 \
    --frames 6 --configs uniform,single --crop --out FRAMES_AB_SI_256_CROP.json
# 3. per-iteration stage breakdown, untiled (single-region) 128^3
run iter_untiled python benchmarks/bench_iter.py 128 --untiled
# 4. per-iteration breakdown, tiled 128^3 (r5-at-head record)
run iter_tiled python benchmarks/bench_iter.py 128
# 5. per-frame setup profile at SI 128^3 (warm-frame intercept)
run pf128_single python benchmarks/profile_frame.py --scene jelly_jam_si --n 128 --untiled --segment-iters 200
# 6. re-measure the r3-era suite records at head (run-scan CC + Gram setup
#    changed both step_s and compile_s; toy-tiled 256^3 configs 5/12/13
#    stay documented at their original commit - non-production regime)
run suite_head_64 python benchmarks/suite.py --configs 1,2,4
run suite_head_128 python benchmarks/suite.py --configs 3,6,7
run suite_head_256 python benchmarks/suite.py --configs 8,9
echo "$(date -u +%H:%M:%S) QUEUE-B DONE" >> "$LOG/queue.log"
