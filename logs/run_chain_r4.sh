#!/bin/bash
cd /root/repo
echo "probe: $(date)" > logs/tpu_chain_r4.log
timeout 300 python -c "import jax; print(jax.devices())" >> logs/tpu_chain_r4.log 2>&1
echo "=== sortscreen_probe $(date) ===" >> logs/tpu_chain_r4.log
timeout 5400 python benchmarks/sortscreen_probe.py > logs/sortscreen_probe.log 2>&1
echo "sortscreen exit=$? $(date)" >> logs/tpu_chain_r4.log
echo "=== k15_oracle_check $(date) ===" >> logs/tpu_chain_r4.log
timeout 5400 python benchmarks/k15_oracle_check.py > logs/k15_oracle_check.log 2>&1
echo "k15 exit=$? $(date)" >> logs/tpu_chain_r4.log
echo "=== stream_512m $(date) ===" >> logs/tpu_chain_r4.log
timeout 5400 python benchmarks/stream_512m.py > logs/stream_512m_r4.log 2>&1
echo "stream exit=$? $(date)" >> logs/tpu_chain_r4.log
echo "CHAIN DONE $(date)" >> logs/tpu_chain_r4.log
