#!/bin/bash
# Cold-start serving measurement (VERDICT r13 #6): write the search
# sidecars from one JVM, then serve the query-syntax capstone from a
# FRESH JVM and attribute the cold path (JVM/session/first-read).
# Usage: tools/cold_start.sh [sfDir] [root]
set -e
SF=${1:-/root/testdata/sf0.1}
ROOT=${2:-/tmp/graft-coldstart-idx}
cd "$(dirname "$0")/.."
rm -rf "$ROOT"
sbt -batch "runMain graft.ColdStart write $SF $ROOT" | grep coldstart
T0=$(date +%s.%N)
sbt -batch "runMain graft.ColdStart serve $SF $ROOT" | grep coldstart
T1=$(date +%s.%N)
echo "[coldstart] serve-invocation wall including sbt: $(awk "BEGIN{printf \"%.1f\", $T1-$T0}")s"
sbt -batch "runMain graft.ColdStart serve-pinned $SF $ROOT" | grep coldstart
sbt -batch "runMain graft.ColdStart serve-prewarmed $SF $ROOT" | grep coldstart
