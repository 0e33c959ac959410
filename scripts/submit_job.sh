#!/usr/bin/env bash
# Submit a knowledgegraph_ray CLI command to a Ray cluster as a Ray job.
#
#   RAY_JOB_ADDRESS=http://<head-ip>:8265 scripts/submit_job.sh build \
#       --input 's3://bucket/pages/*.parquet' --work s3://bucket/kg-work \
#       --num-partitions 4096
#
# With RAY_JOB_ADDRESS unset, runs the CLI directly in-process (local mode,
# same code path the tests and bench use) — so this script smoke-tests on a
# laptop with zero cluster.
set -euo pipefail

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"

if [[ -z "${RAY_JOB_ADDRESS:-}" ]]; then
    echo "[submit_job] RAY_JOB_ADDRESS unset -> running locally" >&2
    exec env PYTHONPATH="$REPO_DIR" \
        python -m knowledgegraph_ray.cli "$@"
fi

# On the cluster the job attaches to the running Ray (KGRAY_RAY_ADDRESS=auto,
# see cli._init_ray); the working dir ships the package to every node.
exec ray job submit \
    --address "$RAY_JOB_ADDRESS" \
    --working-dir "$REPO_DIR" \
    --runtime-env-json '{"env_vars": {"KGRAY_RAY_ADDRESS": "auto"}}' \
    -- python -m knowledgegraph_ray.cli "$@"
