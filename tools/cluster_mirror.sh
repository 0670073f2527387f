#!/usr/bin/env bash
# One-command distributed-mirror run (see graft.ClusterMirror):
# package, start a real standalone master+worker (separate executor
# JVMs), run the mirror query set against the cluster and local mode,
# compare row-for-row, stop the daemons. Exits non-zero on mismatch.
#
# local-cluster[...] does NOT work against the /opt/spark distribution
# layout ("Cannot find any build directories"); real daemons do.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch package
JAR="$(ls target/scala-2.13/*.jar | head -1)"

/opt/spark/sbin/start-master.sh -h 127.0.0.1 -p 7077
trap '/opt/spark/sbin/stop-worker.sh || true; /opt/spark/sbin/stop-master.sh || true' EXIT
sleep 2
/opt/spark/sbin/start-worker.sh spark://127.0.0.1:7077 -c 4 -m 4g
sleep 3

SPARK_GRAFT_JARS="$JAR" \
  sbt -batch "runMain graft.ClusterMirror spark://127.0.0.1:7077 ${1:-/root/testdata/sf0.001}" \
  2>/dev/null | grep MIRROR
