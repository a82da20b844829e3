#!/bin/bash
# Round-5 TPU chain: LUT repair -> calibration -> fresh self-search with
# the derived band + capped controller -> fps -> searched arms ->
# same-session shipped control arms -> weight-explosion probe -> report.
#
# Every stage is resumable; rerunning the script skips/continues stages.
# Logs under artifacts/r5_logs/.

set -u
cd /root/repo
mkdir -p artifacts/r5_logs

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 t=$2; shift 2
    if [ -f "artifacts/r5_logs/$name.done" ]; then
        echo "=== $name already done, skipping ===" | tee -a artifacts/r5_logs/chain.log
        return 0
    fi
    echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a artifacts/r5_logs/chain.log
    timeout "$t" "$@" >> "artifacts/r5_logs/$name.log" 2>&1
    local rc=$?
    echo "=== $name exit=$rc ($(date +%H:%M:%S)) ===" | tee -a artifacts/r5_logs/chain.log
    [ $rc -eq 0 ] && touch "artifacts/r5_logs/$name.done"
    return $rc
}

# 0. park round-4 chain artifacts (pretrain weights are reused)
if [ -d artifacts/self_search/search ] && [ ! -d artifacts/self_search_r4 ]; then
    mkdir -p artifacts/self_search_r4
    for d in search train_teacher train_student teacher_ckpt fps.json \
             train_teacher.jsonl train_student.jsonl; do
        [ -e "artifacts/self_search/$d" ] && \
            mv "artifacts/self_search/$d" artifacts/self_search_r4/
    done
fi

# 1. re-measure the implausible Cout8 head LUT entries (idle device)
run remeasure 1200 python scripts/remeasure_lut_heads.py || exit 1

# 2. latency calibration (fits + applies __fusion_factor__)
run calibrate 3600 python scripts/calibrate_latency.py --apply || exit 1

# 3. fresh bi-level search: derived band, capped controller, calibrated LUT
run search 7200 python scripts/self_search.py search --epochs 30 || exit 1

# 4. measured FPS of the searched student (fast body, scoreboard harness)
run fps 2400 python scripts/self_search.py fps || exit 1

# 5. searched arms
run teacher 5400 python scripts/self_search.py train --stage teacher || exit 1
run student 5400 python scripts/self_search.py train --stage student || exit 1

# 6. same-session shipped-genotype control arms
run teacher_shipped 5400 python scripts/self_search.py train --stage teacher --plan shipped || exit 1
run student_shipped 5400 python scripts/self_search.py train --stage student --plan shipped || exit 1

# 7. weight-explosion probe on the committed round-4 snapshots
run probe 5400 python scripts/probe_weight_explosion.py --train || true

# 8. serving segment split (scoreboard harness) -> evidence
run profile 3600 bash -c 'python -m fasterseg_tpu.cli.profile > evidence/fast_body/segments.json' || true

# 9. report (fails loudly if an arm is missing)
run report 600 python scripts/self_search.py report || exit 1

echo "chain complete $(date +%H:%M:%S)" | tee -a artifacts/r5_logs/chain.log
