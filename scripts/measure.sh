#!/usr/bin/env bash
# Perf sampling harness (capability of the reference's scripts/measure.sh):
# runs a command while sampling CPU% and RSS, then prints wall time and peaks.
#
#   scripts/measure.sh python bench.py
#
# Output: one summary line + a TSV sample log at $MEASURE_LOG (default
# measure_samples.tsv).
set -euo pipefail

LOG="${MEASURE_LOG:-measure_samples.tsv}"
INTERVAL="${MEASURE_INTERVAL:-1}"

"$@" &
PID=$!
START=$(date +%s.%N)
echo -e "t_s\tcpu_pct\trss_mb" > "$LOG"

PEAK_RSS=0
PEAK_CPU=0
while kill -0 "$PID" 2>/dev/null; do
    if STATS=$(ps -o %cpu=,rss= -p "$PID" 2>/dev/null); then
        CPU=$(echo "$STATS" | awk '{print $1}')
        RSS_MB=$(echo "$STATS" | awk '{printf "%.1f", $2/1024}')
        T=$(echo "$(date +%s.%N) $START" | awk '{printf "%.1f", $1-$2}')
        echo -e "${T}\t${CPU}\t${RSS_MB}" >> "$LOG"
        PEAK_RSS=$(echo "$PEAK_RSS $RSS_MB" | awk '{print ($2>$1)?$2:$1}')
        PEAK_CPU=$(echo "$PEAK_CPU $CPU" | awk '{print ($2>$1)?$2:$1}')
    fi
    sleep "$INTERVAL"
done
# Under `set -e` a bare `wait` on a failed command would exit here before
# the summary prints; capture the status explicitly instead.
RC=0
wait "$PID" || RC=$?
END=$(date +%s.%N)
WALL=$(echo "$END $START" | awk '{printf "%.1f", $1-$2}')
echo "measure: wall=${WALL}s peak_cpu=${PEAK_CPU}% peak_rss=${PEAK_RSS}MB rc=${RC} samples=${LOG}" >&2
exit "$RC"
