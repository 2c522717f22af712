#!/bin/bash
# Round-19 protocol close-out of the r18 bench movers on touched paths:
# q229_ltr_features_prox 6.69 -> 11.01 s (1.65x, Ltr.scala in the r18
# diff) and q232_cascade_rerank 5.14 -> 6.72 s (1.31x). Isolated
# Scratch warm A/B, one JVM at a time, r17-end (ab24ddd, pre-diff) vs
# HEAD, cold + 4 warm at sf0.1, plus the executed plans for the
# normalized diff. Band-checks the sub-second tail movers too.
set -u
SF=/root/testdata/sf0.1
OUT=/root/repo/target/ab_r19
mkdir -p "$OUT"
QUERIES="q229_ltr_features_prox q232_cascade_rerank q44_ann_ivf_topk q50_lang_id q60_fingerprint_winnow"

echo "[ab] building r17 worktree..."
(cd /root/repo/.wt-r17 && sbt -batch compile) > "$OUT/build_wt-r17.log" 2>&1
echo "[ab] building HEAD..."
(cd /root/repo && sbt -batch compile) > "$OUT/build_head.log" 2>&1

for q in $QUERIES; do
  for tree in /root/repo/.wt-r17 /root/repo; do
    tag=$([ "$tree" = /root/repo ] && echo head || basename "$tree")
    echo "[ab] $q @ $tag"
    (cd "$tree" && sbt -batch "runMain graft.Scratch $q $SF 4") \
      > "$OUT/${q}_${tag}.log" 2>&1
  done
done
echo "[ab] ALL DONE"
grep -h "\[scratch\]" "$OUT"/*.log
