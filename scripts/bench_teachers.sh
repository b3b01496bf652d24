#!/bin/sh
# Teacher-variant throughput sweep (VERDICT r3 #7): the same flagship
# distill step under each DINOv2 teacher (reference variant table
# /root/reference/train.py:103-108). vitb/vitl/vitg recompile the step at
# their dims (remote Mosaic compile: minutes cold, cached after).
# Batch sizes: vits/vitb at the flagship 256; vitl/vitg at 128 (HBM:
# fp32+bf16 teacher params alone are 1.7 GB / 6.8 GB).
set -x
cd "$(dirname "$0")/.."
python -u bench.py --teacher dinov2_vitb14 --batch 256 --steps 10 --warmup 3 "$@"
python -u bench.py --teacher dinov2_vitl14 --batch 128 --steps 10 --warmup 3 "$@"
python -u bench.py --teacher dinov2_vitg14 --batch 64 --steps 10 --warmup 3 "$@"
