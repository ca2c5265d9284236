#!/bin/bash
# Probe the axon TPU tunnel in a loop; the moment it answers, launch the
# round-4 measurement battery (scripts/tpu_battery_r4.sh). Run under
# tmux — probes hang when the tunnel is down, so each is bounded by
# `timeout`, and status goes to /tmp/tunnel_status.txt for polling.
cd "$(dirname "$0")/.." || exit 1
STATUS=/tmp/tunnel_status.txt
PROBE_TIMEOUT=${PROBE_TIMEOUT:-900}
SLEEP=${SLEEP:-120}

while true; do
    echo "$(date -u +%H:%M:%S) probing (timeout ${PROBE_TIMEOUT}s)" >> "$STATUS"
    if timeout "$PROBE_TIMEOUT" python -c "
import jax
d = jax.devices()[0]
assert d.platform == 'tpu', d
import jax.numpy as jnp
(jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
print('TUNNEL_UP')
" 2>/dev/null | grep -q TUNNEL_UP; then
        echo "$(date -u +%H:%M:%S) TUNNEL UP — starting battery" >> "$STATUS"
        bash scripts/tpu_battery_r4.sh > /tmp/battery_r4.log 2>&1
        echo "$(date -u +%H:%M:%S) battery exited rc=$? (log /tmp/battery_r4.log)" >> "$STATUS"
        exit 0
    fi
    echo "$(date -u +%H:%M:%S) tunnel down; sleeping ${SLEEP}s" >> "$STATUS"
    sleep "$SLEEP"
done
