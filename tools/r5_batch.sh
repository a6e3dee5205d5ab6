#!/bin/bash
# Round-5 serialized TPU measurement batch (run under tmux; one chip).
cd /root/repo
{
  echo "=== config2 sweep ==="
  timeout 1800 python tools/ckpt_sweep.py config2_mirror_glass \
    "8x128,4,16;8x128,8,16;8x128,16,16;8x256,8,16;8x256,16,16" 2>&1 | grep -v WARNING
  echo "=== config3 sweep ==="
  timeout 1200 python tools/ckpt_sweep.py config3_csg_textured \
    "8x128,1,16;8x128,2,16;8x256,1,16" 2>&1 | grep -v WARNING
  echo "=== fused table r5 ==="
  timeout 3000 python tools/perfprobe.py --grad --grad-backend pallas-fused \
    --scenes config1_sphere_room,config2_mirror_glass,config3_csg_textured,config4_hypersphere,config5_warp_portal,config6_expr_space,config7_warp4d,grad_probe 2>&1 | grep -v WARNING
  echo "=== sharding tax fwd ==="
  timeout 900 python tools/scaling_probe.py --chips 1 --tile 32x256 \
    --scene config1_sphere_room 2>&1 | grep -v WARNING
  echo "=== sharding tax train ==="
  timeout 900 python tools/scaling_probe.py --chips 1 --grad \
    --backend pallas-fused --scene config1_sphere_room 2>&1 | grep -v WARNING
  echo "=== bench n30 ==="
  timeout 900 python bench.py 2>&1 | grep -v WARNING
  echo "=== BATCH DONE ==="
} > /tmp/tpu_batch_r5.log 2>&1
