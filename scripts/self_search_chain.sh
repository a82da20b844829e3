#!/bin/bash
# Chained end-to-end self-search pipeline (scripts/self_search.py).
# Each stage resumes where it left off; logs to /tmp/selfsearch_chain.log.
set -x
cd /root/repo
P=python
$P scripts/self_search.py pretrain --epochs 20   || exit 1
$P scripts/self_search.py search   --epochs 30   || exit 2
$P scripts/self_search.py train --stage teacher --epochs 40 || exit 3
$P scripts/self_search.py train --stage student --epochs 40 || exit 4
$P scripts/self_search.py fps                     || exit 5
$P scripts/self_search.py report                  || exit 6
echo "SELF_SEARCH_CHAIN_DONE"
