#!/bin/bash
cd /root/repo
echo "bench start $(date)" > logs/bench_r4_status.log
timeout 7200 python bench.py > logs/bench_r4.json 2> logs/bench_r4.log
echo "bench exit=$? $(date)" >> logs/bench_r4_status.log
