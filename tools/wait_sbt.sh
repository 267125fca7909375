#!/bin/bash
# Wait until the sbt tmux session is back at the prompt, then print the
# last command's tail. Usage: tools/wait_sbt.sh [max_seconds]
max=${1:-600}
for i in $(seq 1 $((max / 5))); do
  sleep 5
  last=$(tmux capture-pane -t sbt -p | grep -vE '^\s*$' | tail -1)
  if echo "$last" | grep -q 'sbt:blockchaintoavrospark>'; then
    tmux capture-pane -t sbt -p -S -200 | grep -E '\[verify\]|\[success\]|\[error\] \(|Nonzero|error found' | tail -20
    exit 0
  fi
done
echo "TIMEOUT waiting for sbt prompt"
exit 1
