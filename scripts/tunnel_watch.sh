#!/bin/bash
# Probe the TPU tunnel every 10 min; exit 0 the moment it answers.
# Each probe is a throwaway subprocess (jax.devices() hangs in-process
# when the tunnel is down). Exits 1 after --max-hours (default 11).
MAX_S=$(( ${1:-11} * 3600 ))
T0=$(date +%s)
while true; do
  if timeout 150 python -c "import jax; print(jax.devices()[0])" >/tmp/tunnel_probe.out 2>&1; then
    echo "TUNNEL UP at $(date -u +%FT%T): $(cat /tmp/tunnel_probe.out)"
    exit 0
  fi
  NOW=$(date +%s)
  if (( NOW - T0 > MAX_S )); then
    echo "tunnel still down after $(( (NOW-T0)/3600 ))h — giving up"
    exit 1
  fi
  echo "probe failed at $(date -u +%FT%T); sleeping 600s"
  sleep 600
done
