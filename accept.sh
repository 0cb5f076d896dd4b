#!/usr/bin/env bash
# Turnkey quality acceptance (round-2 VERDICT next #3): the one command to
# run the moment a real DINO checkpoint is available.
#
#   ./accept.sh /path/to/dino_vitbase8_pretrain.pth [lpips_alex.npz]
#
# port -> train cows + apples2oranges 2000 steps -> evaluate PSNR/SSIM/LPIPS
# vs datasets/splicing/<pair>/ref/output.png -> JSON verdict in accept.json.
# See scripts/accept.py for the full protocol and the two blocking
# artifacts (reference outputs, LPIPS weights) this environment cannot
# produce itself.
set -euo pipefail
cd "$(dirname "$0")"
CKPT="${1:?usage: ./accept.sh <dino_checkpoint.pth> [lpips_alex.npz]}"
LPIPS="${2:-}"
ARGS=(--checkpoint "$CKPT" --n_epochs 2000)
if [[ -n "$LPIPS" ]]; then ARGS+=(--lpips_weights "$LPIPS"); fi
exec python scripts/accept.py "${ARGS[@]}"
