#!/usr/bin/env bash
# Local n-process launch over real sockets (reference
# scripts/launch-tmuxlocal.sh): one pane per party, JSON configs from conf/.
#   ./scripts/launch-tmuxlocal.sh apps/process_main.py conf/mpc 4
set -euo pipefail
PROG=${1:?program}
CONF_DIR=${2:-conf/mpc}
N=${3:-4}
SESSION=hbmpc-$$

tmux new-session -d -s "$SESSION" -n mpc
for ((i=0; i<N; i++)); do
    # local multi-process runs use CPU jax (the axon TPU tunnel is single-client)
    CMD="env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu PYTHONPATH= python $PROG -d -f $CONF_DIR/local.$i.json"
    if ((i == 0)); then
        tmux send-keys -t "$SESSION":0 "$CMD" Enter
    else
        tmux split-window -t "$SESSION":0
        tmux select-layout -t "$SESSION":0 tiled
        tmux send-keys -t "$SESSION":0 "$CMD" Enter
    fi
done
echo "attached session: tmux attach -t $SESSION"
