#!/bin/bash
# Chained end-to-end self-search pipeline (scripts/self_search.py).
# Each stage resumes where it left off; logs to /tmp/selfsearch_chain.log.
# Stages are time-boxed to end before DEADLINE (epoch seconds) so a
# round-end bench run never contends with a training stage; a timed-out
# stage resumes next launch. After every stage the small evidence files
# are synced into the committed evidence/ tree and committed (VERDICT r3
# #6 — claims must be auditable from the checkout alone).
DEADLINE=${DEADLINE:-1787066000}
set -x
cd /root/repo
P=python

# ProcCity is a pure function of (seed, index) — regenerate if absent
if [ ! -f artifacts/proccity/train.txt ]; then
  $P -c "from fasterseg_tpu.data.procgen import write_dataset; \
write_dataset('artifacts/proccity', n_train=160, n_val=40, hw=(256,512), seed=0)"
fi

collect() {
  $P scripts/collect_evidence.py --commit -m "evidence: self-search $1"
}

run_stage() {
  NOW=$(date +%s)
  BUDGET=$((DEADLINE - 600 - NOW))
  if [ $BUDGET -le 60 ]; then
    echo "DEADLINE reached — stopping before: $*"
    collect "partial ($1 not run)"
    exit 9
  fi
  timeout $BUDGET $P scripts/self_search.py "$@"
  RC=$?
  collect "$1"
  return $RC
}

run_stage pretrain --epochs 20              || exit 1
run_stage search   --epochs 30              || exit 2
run_stage train --stage teacher --epochs 40 || exit 3
run_stage train --stage student --epochs 40 || exit 4
run_stage fps                               || exit 5
run_stage report                            || exit 6
git add SEARCH.md evidence && git commit -m "self-search: end-to-end report (pretrain->search->decode->teacher->distilled student->fps)" || true
echo "SELF_SEARCH_CHAIN_DONE"
