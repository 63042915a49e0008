#!/usr/bin/env bash
# Extract downloaded LibriTTS archives (parity: reference extract.sh).
set -e
for f in dev-clean dev-other test-clean test-other \
         train-clean-100 train-clean-360 train-other-500; do
    [ -f "${f}.tar.gz" ] && tar xzf "${f}.tar.gz" &
done
wait
