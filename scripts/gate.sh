#!/usr/bin/env bash
# Standing correctness gate — run before claiming any round "green".
#
# Chains the three checks that together predicted every driver verdict
# so far:
#   1. full registry at sf0.001  (fast catch-all)
#   2. full registry at sf0.01   (the driver's CORRECTNESS gate SF)
#   3. float-sensitive sweep at sf0.1 (10x the gate SF) — the
#      comparison/libm-heavy queries whose cross-engine hazards
#      (percentile interpolation ulps, ln(0) domain, libm drift) are
#      invisible at the small SFs; this sweep caught two real defects
#      in round 8.
#
# check.py hard-fails on int-vs-float dtype drift (the r8
# HUGEINT-window-sum class) as well as on row/column/value mismatch,
# so a green gate here predicts a green driver hash.
#
# Usage: scripts/gate.sh   (from the repo root; ~4 min)
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS="${SPARK_GRAFT_CPUS:-8}"

# The sf0.1 float-sensitive set: every query whose oracle parity
# depends on double comparisons or libm calls over data-scale-many
# rows (percentile cuts, ln/sqrt/exp, covariance folds, cosine
# rankings). Grow this list when adding such a query.
FLOAT_SENSITIVE="q_curriculum,q_market_beta,q_cluster_audit,q_autocorr,q_ewma,q_realized_vol,q_log_returns,q_hll_ndv,q_winnow,q_hybrid_search,q_roll_spread,q_amihud,q_hurst,q_leadlag_corr,q_small_qty_revenue,q_burst_detect,q_range_vol,q_market_share,q_promo_share,q_cs_spread,q_rolling_corr,q_bipower,q_epps_curve,q_zipf_fit,q_realized_moments,q_semivariance,q_medrv,q_gram_matrix,q_pca_power,q_mean_reversion,q_vol_signature,q_bns_jump,q_seasonal_anomaly,q_semantic_dedup,q_overnight_intraday,q_ks_drift,q_newey_west,q_clock_kurtosis,q_impact_exponent,q_leverage_effect,q_volume_elasticity,q_source_kl,q_lexical_diversity,q_reversal_spread,q_cointegration,q_nb_classifier,q_pairs_backtest,q_source_centrality,q_har_rv,q_heldout_ppl,q_vol_cones,q_heaps_fit"

run_gate() {
  local sf="$1" out="$2" filter="${3:-}"
  rm -rf "$out"
  if [ -n "$filter" ]; then
    SPARK_GRAFT_CPUS="$CPUS" sbt -batch \
      "runMain graft.Verify /root/testdata/$sf $out $filter" \
      > "/tmp/gate_verify_$sf.log" 2>&1 \
      || { echo "VERIFY FAILED at $sf — tail of log:"; tail -20 "/tmp/gate_verify_$sf.log"; exit 1; }
  else
    SPARK_GRAFT_CPUS="$CPUS" sbt -batch \
      "runMain graft.Verify /root/testdata/$sf $out" \
      > "/tmp/gate_verify_$sf.log" 2>&1 \
      || { echo "VERIFY FAILED at $sf — tail of log:"; tail -20 "/tmp/gate_verify_$sf.log"; exit 1; }
  fi
  grep -F '[verify]' "/tmp/gate_verify_$sf.log" && { echo "VERIFY had per-query failures at $sf"; exit 1; }
  # check.py prints FAIL lines but exits 0; gate on the absence of FAIL.
  local report
  report="$(python3 scripts/check.py "/root/testdata/$sf" "$out")"
  echo "$report" | tail -3
  if echo "$report" | grep -q '^FAIL'; then
    echo "GATE FAILED at $sf:"; echo "$report" | grep '^FAIL'; exit 1
  fi
}

echo "== gate 1/3: full registry @ sf0.001 =="
run_gate sf0.001 /tmp/gate_sf0.001
echo "== gate 2/3: full registry @ sf0.01 (driver SF) =="
run_gate sf0.01 /tmp/gate_sf0.01
echo "== gate 3/3: float-sensitive sweep @ sf0.1 =="
run_gate sf0.1 /tmp/gate_sf0.1 "$FLOAT_SENSITIVE"
echo "== GATE GREEN =="
