#!/bin/bash
# Chained end-to-end self-search pipeline (scripts/self_search.py).
# Each stage resumes where it left off; logs to /tmp/selfsearch_chain.log.
# Stages are time-boxed to end before DEADLINE (epoch seconds) so a
# round-end bench run never contends with a training stage; a timed-out
# stage resumes next launch.
DEADLINE=${DEADLINE:-1787013493}
set -x
cd /root/repo
P=python

run_stage() {
  NOW=$(date +%s)
  BUDGET=$((DEADLINE - 600 - NOW))
  if [ $BUDGET -le 60 ]; then
    echo "DEADLINE reached — stopping before: $*"
    exit 9
  fi
  timeout $BUDGET $P scripts/self_search.py "$@"
}

run_stage pretrain --epochs 20             || exit 1
run_stage search   --epochs 30             || exit 2
run_stage train --stage teacher --epochs 40 || exit 3
run_stage train --stage student --epochs 40 || exit 4
run_stage fps                               || exit 5
run_stage report                            || exit 6
echo "SELF_SEARCH_CHAIN_DONE"
