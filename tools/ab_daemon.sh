#!/bin/bash
# A/B the pre-warming worker daemon (VERDICT r11 ask #1): run the
# UDF-heavy query subset with the stock pyspark daemon vs pydaemon
# (gc.freeze edition), interleaved to ride out box drift.
set -u
cd /root/repo
SUBSET="${SUBSET:-bpe_encode,ann_ivf_trained,pair_pagerank,multimodal_frame_sample,nn_descent_recall_curve,dedup_pipeline}"
REPS="${REPS:-3}"
OUT="${OUT:-/tmp/ab_daemon}"
mkdir -p "$OUT"
for i in $(seq 1 "$REPS"); do
  for mode in nodaemon daemon; do
    if [ "$mode" = nodaemon ]; then export SPARK_GRAFT_NO_DAEMON=1; else unset SPARK_GRAFT_NO_DAEMON; fi
    python bench.py "only:$SUBSET" 2>/dev/null | tail -1 > "$OUT/${mode}_$i.json"
    echo "== $mode rep $i: $(cat "$OUT/${mode}_$i.json")"
  done
done
