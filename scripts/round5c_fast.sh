#!/bin/bash
# Round-5c FAST: the drop-rate-calibration A/B sized to fit one builder
# session (~1 h wall), because /tmp does not survive the round — results
# that are not banked in BASELINE.md before the session ends are lost.
#
# Deltas vs scripts/round5c_calibration.sh (the full variant):
#   - train to 2.0M images (62,500 steps), the *start* of the known 5b
#     plateau (selection objective flat 1.3M-5.8M), not 6.4M: the A/B
#     compares two eval modes of the SAME checkpoint, so the delta is
#     valid anywhere on the plateau;
#   - skip select (single target checkpoint) and skip the 100-trial TPE
#     tune: reuse the banked 5b tolerance tol=0.00123 (same seeded
#     dataset + config — tolerance is dataset-bound, BASELINE.md §5b);
#   - protocol at --num-test 2000 (not 5000): the pairwise matrices are
#     the wall-clock driver and scale ~N²; both arms and the GT floor
#     use the same N so every comparison stays internally consistent.
#
# Stages: datasets -> flagship(2M) -> eval_base (threshold 0.5) ->
#         eval_calib (--calibrate-drop-rate) -> eval_gt (floor at 2000²).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
OUT=${OUT:-/tmp/round5c}
RUN=${RUN:-/tmp/flagship/run_v3}
CFG=$RUN/.hydra/config.yaml
TARGET_CKPT=$RUN/models/checkpoint_0002000000.ckpt
TOL=0.00123
mkdir -p $OUT /tmp/flagship
say() { echo "$(date) $*" >> $OUT/campaign.log; }

tunnel_up() { timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; }
wait_tunnel() {
  until tunnel_up; do say "tunnel down"; sleep 60; done
  say "tunnel up"
}

stage() { # stage <name> <cmd...> — run once, stamp .ok on rc=0
  local name=$1; shift
  [ -f $OUT/$name.ok ] || [ -f $OUT/$name.skip ] && return 0
  local tries=$(cat $OUT/$name.try 2>/dev/null || echo 0)
  if [ "$tries" -ge 5 ]; then
    say "stage $name: giving up after $tries attempts"
    touch $OUT/$name.skip
    return 1
  fi
  wait_tunnel
  echo $((tries + 1)) > $OUT/$name.try
  say "stage $name: attempt $((tries + 1))"
  local t0=$(date +%s)
  "$@" > $OUT/$name.log 2>&1
  local rc=$?
  echo "WALL $(( $(date +%s) - t0 ))s rc=$rc $name" >> $OUT/walls.txt
  say "stage $name: rc=$rc"
  [ $rc -eq 0 ] && touch $OUT/$name.ok
  return $rc
}

# ------------------------------------------------- 0. datasets (CPU)
if [ ! -f $OUT/datasets.ok ]; then
  python scripts/rebuild_tmp.py > $OUT/datasets.log 2>&1 || exit 1
  touch $OUT/datasets.ok
fi

# ---------------------------------------------------------- 1. flagship
# Identical seeded config to round-5b's run_v2, stopped at 2.0M images.
while [ ! -f "$TARGET_CKPT" ]; do
  pid=$(cat $RUN.pid 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    age=$(( $(date +%s) - $(stat -c %Y $RUN.log 2>/dev/null || echo 0) ))
    if [ "$age" -gt 1200 ]; then
      say "flagship: run.log silent ${age}s — killing wedged pid $pid"
      kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
    fi
    sleep 30; continue
  fi
  if ! tunnel_up; then
    say "flagship: tunnel down"; sleep 60; continue
  fi
  latest=$(ls $RUN/models/checkpoint_*.ckpt 2>/dev/null | sort | tail -1)
  say "flagship: launching from ${latest:-scratch}"
  nohup python -u -m dusty_gan_tpu.cli.train \
    dataset.root=/tmp/proto5k/data dataset=kitti_odometry model=dusty2_dcgan_eqlr \
    solver.batch_size=32 cache_device=true steps_per_call=500 \
    run_dir=$RUN total_iterations=62500 \
    validate_samples=128 resume="$latest" \
    solver.checkpoint.save_stats=1000 solver.checkpoint.test=10000 \
    solver.checkpoint.save_image=50000 solver.checkpoint.save_model=12500 \
    >> $RUN.log 2>&1 &
  echo $! > $RUN.pid
  sleep 120
done
say "flagship: target checkpoint exists"

# ---------------------------------------------------------- 2. A/B + floor
STAGES="eval_base eval_calib eval_gt"

campaign_pass() {
  stage eval_base python -m dusty_gan_tpu.cli.evaluate_synthesis \
    --model-path "$TARGET_CKPT" --config-path $CFG \
    --save-dir-path $OUT/eval_base --num-test 2000 --tol $TOL
  stage eval_calib python -m dusty_gan_tpu.cli.evaluate_synthesis \
    --model-path "$TARGET_CKPT" --config-path $CFG \
    --save-dir-path $OUT/eval_calib --num-test 2000 --tol $TOL \
    --calibrate-drop-rate
  stage eval_gt python -m dusty_gan_tpu.cli.evaluate_synthesis \
    --model-path "$TARGET_CKPT" --config-path $CFG \
    --save-dir-path $OUT/eval_gt --num-test 2000 --tol 0 --compute-gt
}

while true; do
  campaign_pass
  pending=0
  for s in $STAGES; do
    [ -f $OUT/$s.ok ] || [ -f $OUT/$s.skip ] || pending=$((pending + 1))
  done
  [ "$pending" -eq 0 ] && break
  say "$pending stage(s) pending; retrying after 60s"
  sleep 60
done

touch $OUT/ALL_DONE
say "ALL DONE"
