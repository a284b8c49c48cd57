#!/bin/bash
# Poll the axon TPU tunnel; fire the on-chip queue once it answers.
# jax.devices() HANGS (never errors) when the tunnel is down, so the
# probe runs on a daemon thread with a timeout (memory: tpu-harness-quirks).
cd "$(dirname "$0")/.."
LOG=/tmp/tunnel_watch.log
echo "=== tunnel watch start $(date -u) ===" >> "$LOG"
for i in $(seq 1 200); do
  UP=$(timeout 90 python - <<'EOF'
import threading
res = {}
def probe():
    try:
        import jax
        res['d'] = jax.devices()
    except Exception as e:
        res['e'] = repr(e)
t = threading.Thread(target=probe, daemon=True)
t.start(); t.join(60)
print('UP' if 'd' in res else 'DOWN')
EOF
)
  echo "$(date -u) probe $i: $UP" >> "$LOG"
  if [ "$UP" = "UP" ]; then
    echo "$(date -u) tunnel UP — firing onchip queue" >> "$LOG"
    bash benchmarks/onchip_queue.sh
    echo "$(date -u) onchip queue finished rc=$?" >> "$LOG"
    exit 0
  fi
  sleep 180
done
echo "$(date -u) gave up after 200 probes" >> "$LOG"
exit 1
