#!/usr/bin/env bash
# Cold-vs-warm bench for the Memo-heaviest queries (r11 verdict #5).
#
# The round bench measures steady-state per-call latency: shared Memo
# frames (co-access pairs, containment shingles, detector/model frames,
# the incremental-dedup index) are built in warmup or in run 1 and
# excluded by min-of-3. This artifact records what that amortization
# hides: each query runs in a FRESH JVM (empty Memo, cold page cache for
# the session), run 1 = cold (Memo build + first-touch scan), min of
# runs 2-3 = warm. cold-warm therefore bounds the one-time build cost a
# deployment pays once per session/snapshot, not per query.
#
# Usage: tools/bench_cold.sh [sfDir] [outJson]
set -uo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
OUT="${2:-BENCH_COLD.json}"
QUERIES=(
  q_containment        # containmentShingles + clone groups Memo
  q_assortativity      # shared capped co-access edge frame
  q_anomaly_report     # detector frame chain (zscore/kmeans/pca/ensemble)
  q_model_report       # supervised CV fits (rf/gbt/svc)
  q_dedup_minhash_pairs # minhashSig + verified-pairs Memo
  q_dedup_simhash_pairs # simhashSig + pairs Memo
  q_dedup_incremental  # persisted index BUILD (parquet write) + probe
  q_tfidf              # corpus term-frequency Memo
  q_kmeans_anomaly     # fitted KMeans model registry
  q_ann_ivf            # IVF centroid fit + assignment Memo
  # r14 memo-sharing moved the decontamination trio's one-time cost into
  # the shared docShingleHashes5 frame — record where the cold build now
  # lands for each consumer (r14 verdict #5)
  q_decontaminate      # docShingleHashes5 build lands here when first
  q_contamination_pairs # ...or here (whichever runs first in a session)
  q_ngram_novelty      # third consumer of the shared frame
  q_dedup_index_compact # LSM generation fold + atomic staged publish
)
rows=""
for q in "${QUERIES[@]}"; do
  # fresh index build per cold run for the incremental query: nuke its
  # fingerprinted index dir so the cold pass pays the real build
  if [ "$q" = "q_dedup_incremental" ]; then rm -rf /tmp/graft_mh_index_*; fi
  line=$(SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.TimeOne "$q" "$SF" 3 2>/dev/null | grep '^TIMEQ')
  t1=$(echo "$line" | awk '{print $3}')
  t2=$(echo "$line" | awk '{print $4}')
  t3=$(echo "$line" | awk '{print $5}')
  warm=$(python3 -c "print(min($t2,$t3))")
  ratio=$(python3 -c "print(round($t1/max($warm,1e-9),2))")
  echo "COLD $q cold=$t1 warm=$warm ratio=$ratio"
  rows="$rows{\"query\":\"$q\",\"cold\":$t1,\"warm\":$warm,\"cold_over_warm\":$ratio},"
done
rows="[${rows%,}]"
printf '{"metric":"bench_cold","sf":"%s","runs_per_query":3,"note":"fresh JVM per query: cold = run 1 (Memo/model/index build + first-touch scan), warm = min(run 2, run 3) — the amortized build cost the round bench excludes by design (SCALE probes cold_pass:false)","queries":%s}\n' \
  "$SF" "$rows" > "$OUT"
cat "$OUT"
