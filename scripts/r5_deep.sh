#!/bin/bash
# Round-5 depth: 16k full solve with the new flagship; refactor cadence.
set -u
cd /root/repo
mkdir -p /tmp/r5
run() {
  name=$1; shift
  echo "=== $name: $* ===" >> /tmp/r5/deep_progress
  python bench.py "$@" > /tmp/r5/$name.json 2> /tmp/r5/$name.log
  echo "rc=$? $(cat /tmp/r5/$name.json 2>/dev/null)" >> /tmp/r5/deep_progress
}
run deep_full8k_refac2k --mode full --no-oracle --refactor-every 2048
run deep_full16k --mode full --no-oracle --m 16384 --n 32768
touch /tmp/r5/deep_done
