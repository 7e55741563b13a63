#!/bin/bash
# Round-10 bootstrap floor assembly (SCALE.md "Verdict item 1").
#
# Sources, newest first:
#   $1 = run3 bench.json   (current code, stable fingerprints)
#   $2 = run1+run2 merge   (current code, earlier sessions)
#   $3 = round-9 recording (git c99cafb:bench.json, pre-fingerprint)
#   $4 = round-8 recording (git a17530f:bench.json, pre-fingerprint)
#
# --reset = queries whose MEASURED WORK changed in rounds 9-10, so
# historical floors are not this code's floors:
#   stream_ann_index                r9: redesigned as an 8-batch drain
#                                       with two live threshold merges
#   cdc_scd2                        r9: (sequence,pos) posexplode order
#   dedup_incremental_served,       r10: probes materialize eagerly and
#   dedup_substring_served,              release caches (localCheckpoint
#   stream_dedup_index,                  + finally-unpersist) — the
#   stream_dedup_index_cdc,              measured probe work changed
#   stream_substring_index,
#   stream_substring_index_cdc
# (Queries new in rounds 9-10 have no older values; merge_floor skips
# absent keys naturally.)
set -euo pipefail
cd "$(dirname "$0")/.."
python3 tools/merge_floor.py bench.json "$@" --reset \
  stream_ann_index,cdc_scd2,dedup_incremental_served,dedup_substring_served,stream_dedup_index,stream_dedup_index_cdc,stream_substring_index,stream_substring_index_cdc
