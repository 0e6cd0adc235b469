#!/usr/bin/env bash
# Crash-loop training wrapper — equivalent of the reference's
# train_on_merlin.sh while-loop (SURVEY.md §5 failure detection): restart
# training with --resume on any non-zero exit, after a cool-down.
#
# Usage: tools/train_forever.sh [train.py args...]
set -u
COOLDOWN="${COOLDOWN:-20}"
while true; do
    python train.py --resume "$@"
    code=$?
    if [ $code -eq 0 ]; then
        echo "training finished cleanly"
        break
    fi
    echo "training exited with code $code; restarting in ${COOLDOWN}s" >&2
    sleep "$COOLDOWN"
done
