#!/bin/bash
cd /root/repo
echo "chain2 start $(date)" > logs/tpu_chain2_r4.log
echo "=== stream_512m retry $(date) ===" >> logs/tpu_chain2_r4.log
timeout 5400 python benchmarks/stream_512m.py > logs/stream_512m_r4.log 2>&1
echo "stream exit=$? $(date)" >> logs/tpu_chain2_r4.log
echo "=== k17_probe $(date) ===" >> logs/tpu_chain2_r4.log
timeout 7200 python benchmarks/k17_probe.py > logs/k17_probe.log 2>&1
echo "k17 exit=$? $(date)" >> logs/tpu_chain2_r4.log
echo "CHAIN2 DONE $(date)" >> logs/tpu_chain2_r4.log
