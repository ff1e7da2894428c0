#!/bin/bash
# Liveness-gated runner: probe the tunneled TPU with a tiny timed matmul
# (in a subprocess — jax.devices() itself can hang when the tunnel
# wedges), and run the given command once the chip answers. Retries for
# up to GATE_MAX_S (default 8h), probing every GATE_POLL_S (default 300).
GATE_MAX_S=${GATE_MAX_S:-28800}
GATE_POLL_S=${GATE_POLL_S:-300}
start=$(date +%s)
while true; do
  if timeout 90 python - <<'EOF' > /dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
float((x @ x).sum())
EOF
  then
    echo "GATE: chip alive $(date -u +%H:%M:%S), running: $*"
    exec "$@"
  fi
  now=$(date +%s)
  if [ $((now - start)) -gt "$GATE_MAX_S" ]; then
    echo "GATE: gave up after $((now - start))s — tunnel down"
    exit 2
  fi
  echo "GATE: tunnel down $(date -u +%H:%M:%S), retry in ${GATE_POLL_S}s"
  sleep "$GATE_POLL_S"
done
