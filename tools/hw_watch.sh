#!/bin/bash
# Probe the axon relay; after 2 consecutive good probes run the hardware
# checklist once.  Detached-friendly: logs to hw_logs/watch.log.
cd "$(dirname "$0")/.."
mkdir -p hw_logs
ok=0
for i in $(seq 1 200); do
    if timeout 90 python -u -c "import jax, jax.numpy as jnp; jax.devices(); print(float(jnp.arange(8.).sum()))" >/dev/null 2>&1; then
        ok=$((ok+1))
        echo "$(date +%T) probe ok ($ok)" >> hw_logs/watch.log
        if [ "$ok" -ge 2 ]; then
            echo "$(date +%T) relay stable -> running checklist" >> hw_logs/watch.log
            bash tools/hw_checklist.sh >> hw_logs/watch.log 2>&1
            echo "$(date +%T) checklist finished" >> hw_logs/watch.log
            exit 0
        fi
    else
        ok=0
        echo "$(date +%T) probe failed" >> hw_logs/watch.log
    fi
    sleep 120
done
