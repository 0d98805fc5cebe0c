#!/usr/bin/env bash
# Long-horizon drift evaluation (round 4, VERDICT item 7): >=1000 frames
# on multiple scene types, BA off / BA on / BA-without-lines, on the real
# TPU via the production CLI.  The world-based scenes (textured / corridor
# / adversarial) size their world to the path length; the fixed-box
# synthetic stamps scene cannot support long horizons (the camera drives
# past its content).  Scenes are regenerated deterministically on
# CPU (tools/export_scene.py); each run prints the CLI's --gt ATE/RPE
# report, collected into /tmp/drift_r4/.
#
# Usage: bash tools/eval_drift.sh [frames] [scene ...]
set -u
cd "$(dirname "$0")/.."
FRAMES=${1:-1000}
shift || true
SCENES=${*:-"textured corridor adversarial"}
OUT=/tmp/drift_r4
mkdir -p "$OUT"

export PYTHONPATH=/root/repo:${PYTHONPATH:-}

for scene in $SCENES; do
    d="$OUT/scene_${scene}_${FRAMES}"
    if [ ! -f "$d/gt_kitti.txt" ]; then
        echo "=== exporting $scene x $FRAMES"
        JAX_PLATFORMS=cpu python tools/export_scene.py "$d" \
            --frames "$FRAMES" --scene "$scene" || exit 1
    fi
    MODES=${DRIFT_MODES:-"plain ba ba_nolines"}
    for mode in $MODES; do
        log="$OUT/${scene}_${FRAMES}_${mode}.log"
        case $mode in
            plain)      flags="" ;;
            ba)         flags="--ba-window 4 --ba-kf-every 10" ;;
            ba_nolines) flags="--ba-window 4 --ba-kf-every 10 --ba-no-lines" ;;
            ba_forced)  flags="--ba-window 4 --ba-kf-every 10 --ba-forced-lines" ;;
            ba_entropy) flags="--ba-window 4" ;;   # needNewKF-driven keyframes
            ba_k8)      flags="--ba-window 8 --ba-kf-every 10" ;;
            ba_k16)     flags="--ba-window 16 --ba-kf-every 10" ;;
        esac
        echo "=== $scene $mode -> $log"
        # shellcheck disable=SC2086
        timeout 3600 python -m stvo_pl_tpu.cli "$d" --quiet \
            ${DRIFT_CFG:+-c "$DRIFT_CFG"} \
            --gt "$d/gt_kitti.txt" $flags > "$log" 2>&1
        grep -E "ATE|RPE|refined" "$log" | tail -6
    done
done
echo "=== drift eval done; logs in $OUT"
