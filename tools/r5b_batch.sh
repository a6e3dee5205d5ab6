#!/bin/bash
# Round-5b serialized TPU measurement batch: fused-shell march backward A/B.
# One chip — run alone (no concurrent TPU jobs).
cd /root/repo
{
  echo "=== on-chip grad parity (fused shell) ==="
  timeout 2400 python tools/ckpt_vjp_probe.py \
    --cases march,march4d,expr,march_full 2>&1 | grep -v WARNING
  echo "=== fused train step, marchy configs (fused shell) ==="
  timeout 2400 python tools/perfprobe.py --grad --grad-backend pallas-fused \
    --scenes config5_warp_portal,config6_expr_space,config7_warp4d \
    2>&1 | grep -v WARNING
  echo "=== BATCH DONE ==="
} > /tmp/tpu_batch_r5b.log 2>&1
