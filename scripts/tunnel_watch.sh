#!/bin/bash
# Probe the axon tunnel every 10 min; log transitions. Detached helper for
# long wedge recoveries (kill by PID in /tmp/tunnel_watch.pid when done).
cd /root/repo
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$(date -u +%H:%M:%S) TUNNEL ALIVE"
  else
    echo "$(date -u +%H:%M:%S) tunnel dead"
  fi
  sleep 600
done
