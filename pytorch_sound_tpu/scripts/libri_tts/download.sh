#!/usr/bin/env bash
# Fetch LibriTTS subsets from openslr (parity: reference download.sh).
set -e
for subset in dev-clean dev-other test-clean test-other \
              train-clean-100 train-clean-360 train-other-500; do
    wget -c "http://www.openslr.org/resources/60/${subset}.tar.gz" &
done
wait
