#!/usr/bin/env bash
# Simulated WAN latency for local multi-process runs (reference
# scripts/latency-control.sh): tc/netem delay with jitter on loopback.
#
#   ./scripts/latency-control.sh start [delay] [jitter]   # default 20ms 5ms
#   ./scripts/latency-control.sh change 50ms 10ms
#   ./scripts/latency-control.sh stop
#
# Needs CAP_NET_ADMIN (run as root or under sudo). Affects ALL loopback
# traffic — use only on throwaway test hosts/containers.
set -euo pipefail

DEV=${LATENCY_DEV:-lo}
CMD=${1:-}
DELAY=${2:-20ms}
JITTER=${3:-5ms}

case "$CMD" in
  start)
    tc qdisc add dev "$DEV" root netem delay "$DELAY" "$JITTER" distribution normal
    echo "netem on $DEV: delay $DELAY +/- $JITTER"
    ;;
  change)
    tc qdisc change dev "$DEV" root netem delay "$DELAY" "$JITTER" distribution normal
    echo "netem on $DEV: delay $DELAY +/- $JITTER"
    ;;
  stop)
    tc qdisc del dev "$DEV" root
    echo "netem off $DEV"
    ;;
  show)
    tc qdisc show dev "$DEV"
    ;;
  *)
    echo "usage: $0 {start|change|stop|show} [delay] [jitter]" >&2
    exit 1
    ;;
esac
