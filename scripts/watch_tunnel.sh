#!/bin/bash
# Self-healing flagship run: probe the axon tunnel, (re)launch the resume
# run from the latest checkpoint, repeat until 160000 iterations are done.
cd /root/repo
target_ckpt=/tmp/long3/run2/models/checkpoint_0005120000.ckpt
while true; do
  if [ -f "$target_ckpt" ]; then
    echo "$(date) run complete" >> /tmp/watch_tunnel.log
    exit 0
  fi
  pid=$(cat /tmp/long3/run2.pid 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    sleep 120; continue
  fi
  if ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$(date) tunnel down" >> /tmp/watch_tunnel.log
    sleep 60; continue
  fi
  # resume from the newest checkpoint across run2 then the 1.6M base
  latest=$(ls /tmp/long3/run2/models/checkpoint_*.ckpt /tmp/long3/run/models/checkpoint_0001600000.ckpt 2>/dev/null | sort | tail -1)
  echo "$(date) tunnel up — launching from $latest" >> /tmp/watch_tunnel.log
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache nohup python -u -m dusty_gan_tpu.cli.train \
    dataset.root=/tmp/long3/data dataset=kitti_odometry model=dusty2_dcgan_eqlr \
    solver.batch_size=32 run_dir=/tmp/long3/run2 total_iterations=160000 \
    validate_samples=128 resume="$latest" \
    solver.checkpoint.save_stats=1000 solver.checkpoint.test=2500 \
    solver.checkpoint.save_image=10000 solver.checkpoint.save_model=5000 \
    >> /tmp/long3/run2.log 2>&1 &
  echo $! > /tmp/long3/run2.pid
  sleep 300
done
