#!/bin/bash
# Round-18 protocol close-out of the r17 bench drift cluster
# (q203 2.0x lead): isolated Scratch warm A/B, one JVM at a time,
# r16-end (9ce50dc) vs r17-end (ab24ddd), cold + 3 warm at sf0.1,
# plus the executed plans for the normalized diff.
set -u
SF=/root/testdata/sf0.1
OUT=/root/repo/target/ab_r18
mkdir -p "$OUT"
QUERIES="q203_passage_maxp_topk q87_neardup_keepers q97_ppl_buckets q81_bloom_decontaminate q90_semantic_keepers"

build() {
  local wt=$1
  (cd "$wt" && sbt -batch compile) > "$OUT/build_$(basename "$wt").log" 2>&1
}

echo "[ab] building r16 worktree..."
build /root/repo/.wt-r16
echo "[ab] building r17 worktree..."
build /root/repo/.wt-r17

for q in $QUERIES; do
  for wt in .wt-r16 .wt-r17; do
    tag=$(basename "$wt")
    echo "[ab] $q @ $tag"
    (cd "/root/repo/$wt" && sbt -batch "runMain graft.Scratch $q $SF 3") \
      > "$OUT/${q}_${tag}.log" 2>&1
  done
done
echo "[ab] done"
grep -h "\[scratch\]" "$OUT"/*_.wt-r16.log 2>/dev/null
echo "[ab] ALL DONE"
