#!/bin/bash
# Round-5 orchestrator: owns the whole chip session end-to-end so zero
# chip time is lost to tunnel flapping (the axon tunnel was down for the
# final ~11h of round 4; it can drop at any moment and return hours
# later).  /tmp was wiped between rounds, so the 1.6M-image round-4
# checkpoints are gone — the flagship trains FROM SCRATCH, and we use
# the loss of continuity to fix the judge-diagnosed bottleneck: the
# round-4 run was data-bound (2,000 scans), so this one trains on the
# 19,130-scan set rebuild_tmp.py builds (sized to the real KITTI train
# split), which also shares one dataset with the 5,000-sample protocol.
#
# Sequence:
#   0. datasets     — rebuild /tmp/proto5k (CPU, no tunnel needed)
#   1. bench_early  — secure the headline perf number the moment the
#                     tunnel is up (round 4 ended with no bench at all)
#   2. flagship     — train dusty2_dcgan_eqlr to 5.12M images
#                     (self-healing relaunch loop, resumes checkpoints)
#   3. eval campaign — best-ckpt selection -> 100-trial tolerance tune ->
#                     tol=0 eval -> GT floor -> tuned eval (all at the
#                     full 5,000-sample protocol) -> measured 1000^2 EMD
#                     anchor -> chip-verified serving export
# Every stage leaves an .ok stamp in $OUT and is skipped on re-runs, so
# a mid-campaign outage resumes at the failed stage, not from scratch.
# Stages get 5 attempts (tunnel probes gate each) before being .skip-ed.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
# overridable so later passes (e.g. a retrained flagship) rerun the whole
# campaign against a fresh run/output pair without editing this file
OUT=${OUT:-/tmp/round5}
RUN=${RUN:-/tmp/flagship/run}
CFG=$RUN/.hydra/config.yaml
# the FULL reference schedule: 781,250 iterations x batch 32 = 25M images
# (configs/solver/nsgan_eqlr.yaml total_kimg 25000) — affordable because
# the device-resident dataset cache (cache_device=true) makes the wall
# device-bound instead of tunnel-bandwidth-bound
TARGET_CKPT=$RUN/models/checkpoint_0025000000.ckpt
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
  # count attempts only once the tunnel is up and the stage actually runs
  # (orchestrator restarts while blocked in wait_tunnel must not burn them)
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
  t0=$(date +%s)
  python scripts/rebuild_tmp.py > $OUT/datasets.log 2>&1
  rc=$?
  echo "WALL $(( $(date +%s) - t0 ))s rc=$rc datasets" >> $OUT/walls.txt
  say "stage datasets: rc=$rc"
  [ $rc -eq 0 ] && touch $OUT/datasets.ok || exit 1
fi

# ---------------------------------------------------------- 1. bench
bench_early() {
  timeout 1500 python bench.py > $OUT/bench_early.raw 2>&1 || return 1
  grep -h '"metric"' $OUT/bench_early.raw | tail -1 > $OUT/bench_early.json
  [ -s $OUT/bench_early.json ]
}
stage bench_early bench_early

# ---------------------------------------------------------- 2. flagship
# Relaunch cli.train from the newest checkpoint (or scratch) until the
# 5.12M-image checkpoint exists.
while [ ! -f "$TARGET_CKPT" ]; do
  pid=$(cat $RUN.pid 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    # self-heal a hung backend init: scalars print every ~1-3 min while
    # actually training, so a log silent for 30 min means the process is
    # wedged in jax.devices()/compile against a dead tunnel
    age=$(( $(date +%s) - $(stat -c %Y $RUN.log 2>/dev/null || echo 0) ))
    if [ "$age" -gt 1800 ]; then
      say "flagship: run.log silent ${age}s — killing wedged pid $pid"
      kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
    fi
    sleep 120; continue
  fi
  if ! tunnel_up; then
    say "flagship: tunnel down"; sleep 60; continue
  fi
  latest=$(ls $RUN/models/checkpoint_*.ckpt 2>/dev/null | sort | tail -1)
  say "flagship: launching from ${latest:-scratch}"
  # cadence: validation every 10k iters (the reference's, nsgan_eqlr.yaml),
  # checkpoints every 20k so every other validation point is selectable
  # steps_per_call=500: 500 train iterations per device call (lax.scan over
  # the device-resident cache) — host dispatch leaves the wall entirely
  # (measured per-step cache_device path: ~2.9k scans/s; device bound 3.9k)
  nohup python -u -m dusty_gan_tpu.cli.train \
    dataset.root=/tmp/proto5k/data dataset=kitti_odometry model=dusty2_dcgan_eqlr \
    solver.batch_size=32 cache_device=true steps_per_call=500 \
    run_dir=$RUN total_iterations=781250 \
    validate_samples=128 resume="$latest" \
    solver.checkpoint.save_stats=1000 solver.checkpoint.test=10000 \
    solver.checkpoint.save_image=50000 solver.checkpoint.save_model=20000 \
    >> $RUN.log 2>&1 &
  echo $! > $RUN.pid
  sleep 300
done
say "flagship: target checkpoint exists"

# ---------------------------------------------------------- 3. campaign
STAGES="tune eval_tol0 gt5000 eval_tuned eval_emd1000 export"

campaign_pass() {
  # 3a. best-validation checkpoint by the tuner objective (CPU-only stage)
  if [ ! -f $OUT/select.txt ] || ! grep -q '^BEST' $OUT/select.txt; then
    python scripts/select_ckpt.py $RUN > $OUT/select.txt 2>&1
  fi
  BEST=$(grep '^BEST' $OUT/select.txt | sed 's/.* //')
  if [ -z "$BEST" ]; then
    say "select produced no BEST; falling back to target checkpoint"
    BEST=$TARGET_CKPT
  fi
  say "BEST=$BEST"

  # 3b. tolerance tuning for real: 100 TPE trials, reference objective/space
  stage tune python -m dusty_gan_tpu.cli.tune_tolerance \
    --model-path "$BEST" --config-path $CFG --save-dir-path $OUT \
    --num-samples 100
  TOL=$(python - <<EOF
import json, glob
fs = sorted(glob.glob("$OUT/tune_*.json"))
print(json.load(open(fs[-1]))["best"]["tol"] if fs else 0.0)
EOF
)
  say "TOL=$TOL"

  # 3c. FULL 5,000-sample protocol (train dataset == protocol dataset):
  # untuned baseline, GT floor, tuned run
  stage eval_tol0 python -m dusty_gan_tpu.cli.evaluate_synthesis \
    --model-path "$BEST" --config-path $CFG --save-dir-path $OUT/eval_tol0 \
    --num-test 5000 --tol 0
  stage gt5000 python -m dusty_gan_tpu.cli.evaluate_synthesis \
    --model-path "$BEST" --config-path $CFG --save-dir-path $OUT/gt5000 \
    --num-test 5000 --compute-gt
  stage eval_tuned python -m dusty_gan_tpu.cli.evaluate_synthesis \
    --model-path "$BEST" --config-path $CFG --save-dir-path $OUT/eval_tuned \
    --num-test 5000 --tol $TOL

  # 3d. EMD protocol anchor: 1000^2-class matrices, measured not projected
  stage eval_emd1000 python -m dusty_gan_tpu.cli.evaluate_synthesis \
    --model-path "$BEST" --config-path $CFG --save-dir-path $OUT/eval_emd1000 \
    --num-test 1000 --tol $TOL --metrics cd,emd

  # 3e. serving export of the flagship checkpoint, verified ON the chip
  # (the CLI self-test reloads the artifact and compares vs the live
  # generator on the TPU backend)
  stage export python -m dusty_gan_tpu.cli.export \
    --model-path "$BEST" --config-path $CFG \
    --output-dir $OUT/export --tol $TOL
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
