#!/usr/bin/env bash
# One-command validation of the LIVE Kafka path on any broker-equipped
# machine — the single environment-bound gap this container cannot
# exercise (docs/LIMITS.md row 1: no broker here).
#
# Usage:
#   scripts/kafka_smoke.sh                      # starts a disposable
#                                               # single-node broker via
#                                               # docker (redpanda), runs
#                                               # the smoke, tears down
#   SPARK_GRAFT_KAFKA=host:9092 scripts/kafka_smoke.sh
#                                               # uses YOUR broker, no
#                                               # docker needed
#
# What runs: tests/test_kafka_integration.py — produce 100 records with
# the batch Kafka sink, consume them back through runner.kafka_source
# (the reference's fetch tuning: 10 MiB/partition, 50 MiB/fetch, 5000-
# record micro-batch quantum, consumer.js:198-256), plus the gzip
# producer-compression passthrough. The spark-sql-kafka package is
# fetched by Spark's --packages resolver on first run (needs network).
#
# Exit 0 = the live path works; the same tests auto-skip where no
# broker is reachable, so CI without Kafka stays green.

set -euo pipefail
cd "$(dirname "$0")/.."

SCALA_VER=2.13
# keep in lockstep with the installed pyspark
SPARK_VER="$(python -c 'import pyspark; print(pyspark.__version__)')"
PKGS="org.apache.spark:spark-sql-kafka-0-10_${SCALA_VER}:${SPARK_VER}"
# spark-avro enables the JVM codec path (LIMITS.md row 2) on the same run
PKGS="${PKGS},org.apache.spark:spark-avro_${SCALA_VER}:${SPARK_VER}"

STARTED_CONTAINER=""
cleanup() {
  if [[ -n "${STARTED_CONTAINER}" ]]; then
    docker rm -f "${STARTED_CONTAINER}" >/dev/null 2>&1 || true
  fi
}
trap cleanup EXIT

if [[ -z "${SPARK_GRAFT_KAFKA:-}" ]]; then
  command -v docker >/dev/null || {
    echo "No SPARK_GRAFT_KAFKA set and no docker available." >&2
    echo "Point SPARK_GRAFT_KAFKA=host:port at a reachable broker." >&2
    exit 2
  }
  STARTED_CONTAINER="spark-graft-redpanda-$$"
  echo ">>> starting disposable single-node redpanda broker"
  docker run -d --name "${STARTED_CONTAINER}" -p 19092:19092 \
    docker.redpanda.com/redpandadata/redpanda:latest \
    redpanda start --smp 1 --overprovisioned --node-id 0 \
    --kafka-addr PLAINTEXT://0.0.0.0:19092 \
    --advertise-kafka-addr PLAINTEXT://127.0.0.1:19092 >/dev/null
  export SPARK_GRAFT_KAFKA=127.0.0.1:19092
  # wait for the broker to accept connections
  for _ in $(seq 1 30); do
    if docker exec "${STARTED_CONTAINER}" rpk cluster health 2>/dev/null \
        | grep -q "Healthy:.*true"; then
      break
    fi
    sleep 1
  done
fi

echo ">>> broker: ${SPARK_GRAFT_KAFKA}; packages: ${PKGS}"
# PYSPARK_SUBMIT_ARGS is how --packages reaches a getOrCreate-built
# session (tests build their own SparkSession; spark-submit is not in
# the loop)
export PYSPARK_SUBMIT_ARGS="--packages ${PKGS} pyspark-shell"

python -m pytest tests/test_kafka_integration.py tests/test_wire_codecs.py \
  -q -rs "$@"
