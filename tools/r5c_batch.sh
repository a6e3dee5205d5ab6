#!/bin/bash
# Round-5c serialized TPU batch: clean fused-shell A/B + config5 forward tiles.
cd /root/repo
{
  echo "=== A: fused shell (MARCH_FUSED_SHELL=True, current default) ==="
  timeout 1800 python tools/perfprobe.py --grad --grad-backend pallas-fused \
    --scenes config5_warp_portal,config6_expr_space,config7_warp4d \
    2>&1 | grep -v WARNING
  echo "=== B: whole-step jax.vjp shell (MARCH_FUSED_SHELL=False) ==="
  timeout 1800 python - <<'EOF' 2>&1 | grep -v WARNING
import sys, runpy
import euclider_tpu.ops.pallas_vjp as pv
pv.MARCH_FUSED_SHELL = False
sys.argv = ["perfprobe.py", "--grad", "--grad-backend", "pallas-fused",
            "--scenes",
            "config5_warp_portal,config6_expr_space,config7_warp4d"]
runpy.run_path("tools/perfprobe.py", run_name="__main__")
EOF
  echo "=== config5 forward tile sweep ==="
  timeout 1800 python tools/perfprobe.py --scenes config5_warp_portal \
    --tiles "8x128,16x128,16x256,32x256,8x256,32x128" --frames 30 \
    2>&1 | grep -v WARNING
  echo "=== BATCH DONE ==="
} > /tmp/tpu_batch_r5c.log 2>&1
