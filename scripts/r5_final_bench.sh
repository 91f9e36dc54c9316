#!/bin/bash
# Round-5 final bench sequence (sequential, one chip).
set -u
cd /root/repo
mkdir -p /tmp/r5
run() {
  name=$1; shift
  echo "=== $name: $* ===" >> /tmp/r5/final_progress
  python bench.py "$@" > /tmp/r5/$name.json 2> /tmp/r5/$name.log
  echo "rc=$? $(cat /tmp/r5/$name.json 2>/dev/null)" >> /tmp/r5/final_progress
}
run final_single
run final_full --mode full
touch /tmp/r5/final_done
