#!/bin/bash
# Poll for TPU availability; when the relay grants, immediately run the
# round-2 validation battery and log everything to /tmp/tpu_watch.log.
LOG=/tmp/tpu_watch.log
cd /root/repo
echo "=== tpu_watch start $(date) ===" >> $LOG
while true; do
  timeout 420 python -u -c "
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')
import jax, numpy as np
d = jax.devices()
x = jax.device_put(np.ones((128,128), np.float32))
y = jax.jit(lambda a: (a@a).sum())(x)
assert float(np.asarray(y)) == 128*128
print('TPU-OK', d)
" >> $LOG 2>&1
  if [ $? -eq 0 ]; then
    echo "=== TPU up at $(date); running battery ===" >> $LOG
    break
  fi
  echo "--- still down $(date) ---" >> $LOG
  sleep 120
done
echo "=== r2_experiments parity ===" >> $LOG
timeout 3000 python scripts/r2_experiments.py parity >> $LOG 2>&1
echo "=== r2_experiments kernel ===" >> $LOG
timeout 3000 python scripts/r2_experiments.py kernel >> $LOG 2>&1
echo "=== hardware tests ===" >> $LOG
SJPEG_TEST_TPU=1 timeout 5400 python -m pytest tests/test_hardware.py -x -q >> $LOG 2>&1
echo "=== bench ===" >> $LOG
timeout 5400 python bench.py >> $LOG 2>&1
echo "=== battery done $(date) ===" >> $LOG
