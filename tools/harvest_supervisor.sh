#!/bin/bash
# Outer supervisor for multi-harvest TPU campaigns through grant outages.
#
# The harvest parents (tools/tpu_harvest*.py, scaffolding in
# tools/harvest_common.py) are patient but have finite --retries budgets;
# a long axon outage (13h+ observed, round 3) can exhaust a whole chain
# with nothing banked.  This wrapper keeps relaunching each harvest until
# its out-file holds the {"step": "done"} sentinel, or /tmp/harvest_stop
# exists (the same drain point the parents honor between attempts).
#
# Single-tenant discipline: strictly serial — at most ONE harvest parent
# (hence one TPU client) alive at any moment.  Optionally waits for a
# prior TPU process to exit first:
#
#   tools/harvest_supervisor.sh [wait_pid] < /dev/null > log 2>&1 &
#
# Edit the HARVESTS table for the campaign at hand:
#   "child_script:out_file:per_attempt_timeout_s"

HARVESTS=(
    "tools/tpu_harvest_csp.py:perf/csp_r3.jsonl:3600"
    "tools/tpu_harvest_large.py:perf/large_r3.jsonl:7200"
)

WAIT_PID="$1"
if [ -n "$WAIT_PID" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

cd "$(dirname "$0")/.." || exit 1

has_done () { grep -q '"step": "done"' "$1" 2>/dev/null; }

while [ ! -f /tmp/harvest_stop ]; do
    all_done=1
    for spec in "${HARVESTS[@]}"; do
        script="${spec%%:*}"; rest="${spec#*:}"
        out="${rest%%:*}"; tmo="${rest##*:}"
        [ -f /tmp/harvest_stop ] && break 2
        if ! has_done "$out"; then
            all_done=0
            python "$script" --retries 20 --retry-wait 300 \
                --timeout "$tmo" --out "$out"
            echo "supervisor: $script rc=$?"
        fi
    done
    if [ "$all_done" = 1 ]; then
        echo "supervisor: all harvests done"
        break
    fi
    sleep 300
done
echo "supervisor: exiting"
