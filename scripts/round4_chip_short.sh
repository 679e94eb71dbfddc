#!/bin/bash
# Round-4 chip session: runs AFTER the flagship resume run reaches 5.12M
# images (watchdog: /tmp/watch_tunnel.sh). Stages log wall seconds.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
RUN=/tmp/long3/run
CFG=$RUN/.hydra/config.yaml
OUT=/tmp/round4s
mkdir -p $OUT

runtimed() { # runtimed <log> <cmd...>
  local log=$1; shift
  local t0=$(date +%s)
  "$@" > "$log" 2>&1
  local rc=$?
  echo "WALL $(( $(date +%s) - t0 ))s rc=$rc $log" | tee -a $OUT/walls.txt
  return $rc
}

# 1. pick best-validation checkpoint by the tuner objective
python /tmp/select_ckpt.py $RUN | tee $OUT/select.txt
BEST=/tmp/long3/run/models/checkpoint_0001120000.ckpt
echo "BEST=$BEST"

# 2. tolerance tuning for real: 100 TPE trials, reference objective/space
runtimed $OUT/tune.log python -m dusty_gan_tpu.cli.tune_tolerance \
  --model-path "$BEST" --config-path $CFG --save-dir-path $OUT \
  --num-samples 100
TOL=$(python -c "import json,glob; print(json.load(open(sorted(glob.glob('$OUT/tune_*.json'))[-1]))['best']['tol'])")
echo "TOL=$TOL"

# 3. eval protocol on the training dataset (200 test scans), untuned vs tuned
runtimed $OUT/eval_tol0.log python -m dusty_gan_tpu.cli.evaluate_synthesis \
  --model-path "$BEST" --config-path $CFG --save-dir-path $OUT/eval_tol0 \
  --num-test 5000 --tol 0
runtimed $OUT/eval_tuned.log python -m dusty_gan_tpu.cli.evaluate_synthesis \
  --model-path "$BEST" --config-path $CFG --save-dir-path $OUT/eval_tuned \
  --num-test 5000 --tol $TOL

# 4. FULL 5000-sample protocol on the 5k dataset: GT floor + model (tuned)
runtimed $OUT/gt5000.log python -m dusty_gan_tpu.cli.evaluate_synthesis \
  --model-path "$BEST" --config-path /tmp/proto5k/cfg/config.yaml \
  --num-test 5000 --compute-gt
runtimed $OUT/eval5000.log python -m dusty_gan_tpu.cli.evaluate_synthesis \
  --model-path "$BEST" --config-path /tmp/proto5k/cfg/config.yaml \
  --save-dir-path $OUT/eval5000 --num-test 5000 --tol $TOL

# 5. EMD protocol anchor: 1000^2-class matrices, measured not projected
runtimed $OUT/eval_emd1000.log python -m dusty_gan_tpu.cli.evaluate_synthesis \
  --model-path "$BEST" --config-path /tmp/proto5k/cfg/config.yaml \
  --save-dir-path $OUT/eval_emd1000 --num-test 1000 --tol $TOL \
  --metrics cd,emd

echo ALL DONE
