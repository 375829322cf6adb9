#!/bin/bash
cd /root/repo
# wait for the bench to finish (it writes bench exit= to the status log)
for i in $(seq 1 240); do
  grep -q "bench exit=" logs/bench_r4_status.log && break
  sleep 30
done
echo "chain3 start $(date)" > logs/tpu_chain3_r4.log
echo "=== stream_3g $(date) ===" >> logs/tpu_chain3_r4.log
STREAM_BASES=3221225472 timeout 10800 python benchmarks/stream_512m.py > logs/stream_3g_r4.log 2>&1
echo "stream_3g exit=$? $(date)" >> logs/tpu_chain3_r4.log
echo "=== scaling idle $(date) ===" >> logs/tpu_chain3_r4.log
timeout 3600 python benchmarks/scaling.py --virtual 8 --fixed-bases 2e8 --reps 3 > logs/scaling_fixed_r4.json 2> logs/scaling_fixed_r4.log
echo "scaling exit=$? $(date)" >> logs/tpu_chain3_r4.log
echo "CHAIN3 DONE $(date)" >> logs/tpu_chain3_r4.log
