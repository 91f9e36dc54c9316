#!/bin/bash
# Round-5 on-chip measurement: multi-price full-solve time-to-optimal
# (VERDICT r4 #1). Sequential — one chip. Outputs to /tmp/r5/.
set -u
cd /root/repo
mkdir -p /tmp/r5
run() {
  name=$1; shift
  echo "=== $name: $* ===" >> /tmp/r5/progress
  date +%s >> /tmp/r5/progress
  python bench.py "$@" > /tmp/r5/$name.json 2> /tmp/r5/$name.log
  echo "rc=$? $(cat /tmp/r5/$name.json 2>/dev/null)" >> /tmp/r5/progress
}
run full_k64 --mode full --multi-price 64 --no-oracle
run full_k32 --mode full --multi-price 32 --no-oracle
run full_k0 --mode full --no-oracle
touch /tmp/r5/done
