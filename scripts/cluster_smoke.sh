#!/usr/bin/env bash
# Separate-JVM-executor smoke lane: run a representative bench slice on
# local-cluster[2,8,4096] (two forked executor JVMs) and demand identical
# fingerprints vs local[8]. See graft.ClusterSmoke scaladoc.
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"
exec sbt -batch "runMain graft.ClusterSmoke ${1:-/root/testdata/sf0.01}"
