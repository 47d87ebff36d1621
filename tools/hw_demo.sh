#!/bin/bash
# End-to-end hardware demo: UDP producer -> ingest -> TPU processing ->
# UDP egress (+v1x frames) -> independent consumer volume, on the real
# chip.  Re-runs the README "End-to-end on hardware" loop as one
# command; pass --device-decode to route the wire decode ON-CHIP
# (ops/device_codec) instead of the host SIMD codec.
#
#   bash tools/hw_demo.sh [--device-decode] [SECTORS]
#
# Probe the tunnel first (see .claude/skills/verify); expect the demo
# to be bound by the dev tunnel's H2D link, not the chip.
set -u
cd "$(dirname "$0")/.."
DD=""
if [ "${1:-}" = "--device-decode" ]; then DD="--device-decode"; shift; fi
SECTORS="${1:-286}"
OUT="${WRP_DEMO_DIR:-/tmp/wrp_hw_demo}"
# WRP_DEMO_METHOD=mxu lets the plumbing run on CPU (pallas interpret
# mode at full geometry is impractically slow off-TPU)
METHOD="${WRP_DEMO_METHOD:-pallas}"
rm -rf "$OUT" && mkdir -p "$OUT"

python -m wrp_tpu.cli stream --transport udp --method "$METHOD" $DD \
    --batch 16 --timeout 10 --idle-limit 30 \
    --checkpoint "$OUT/proc.npz" --extended-results \
    --max-sectors "$SECTORS" --ready-file "$OUT/ready" \
    > "$OUT/stream_stats.json" 2> "$OUT/stream.err" &
STREAM=$!
python -m wrp_tpu.cli consume --count $((SECTORS * 2)) --timeout 240 \
    --volume "$OUT/rx.npz" > "$OUT/consume_stats.json" 2> "$OUT/consume.err" &
CONSUME=$!
while [ ! -f "$OUT/ready" ]; do
    kill -0 $STREAM 2>/dev/null || { echo "stream died during warmup" >&2;
                                     cat "$OUT/stream.err" >&2; exit 1; }
    sleep 2
done
python -m wrp_tpu.cli produce --transport udp --sectors "$SECTORS" \
    --headers 2> "$OUT/produce.err"
wait $STREAM; RC_S=$?
wait $CONSUME; RC_C=$?
python -m wrp_tpu.cli volume "$OUT/proc.npz" \
    --render-all "$OUT/mosaic.ppm" > "$OUT/proc_volume.json" 2>/dev/null
python -m wrp_tpu.cli volume "$OUT/rx.npz" > "$OUT/rx_volume.json" 2>/dev/null
echo "stream rc=$RC_S consume rc=$RC_C  (artifacts in $OUT)"
echo "processor volume: $(cat "$OUT/proc_volume.json")"
echo "consumer  volume: $(cat "$OUT/rx_volume.json")"
# the consumer's independently-rebuilt volume must match the processor's
python - "$OUT" <<'EOF'
import json, sys
proc = json.load(open(sys.argv[1] + "/proc_volume.json"))
rx = json.load(open(sys.argv[1] + "/rx_volume.json"))
keys = [k for k in proc if k.startswith(("zdb", "zdr", "sectors",
                                         "coverage", "elevations"))]
bad = [k for k in keys if proc.get(k) != rx.get(k)]
print("MATCH" if not bad else f"MISMATCH on {bad}")
sys.exit(1 if bad else 0)
EOF
