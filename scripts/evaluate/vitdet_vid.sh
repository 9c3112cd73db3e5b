#!/usr/bin/env bash

# Cluster wrapper for scripts/evaluate/vitdet_vid.py (the TPU analog of the
# reference's Slurm wrapper). Usage:
#   sbatch -J <config-name> ./scripts/evaluate/vitdet_vid.sh        # Slurm
#   ./scripts/evaluate/vitdet_vid.sh <config-name>                  # direct
# One config = one single-host job; TPU topology comes from the environment
# (e.g. a v5e-1 worker). Multi-chip hosts shard the video loop over the
# "data" mesh axis automatically.

#SBATCH --cpus-per-task=16
#SBATCH --output=slurm/%x.txt
#SBATCH --mem=48GB
#SBATCH --time=4-00:00:00

CONFIG="${SLURM_JOB_NAME:-$1}"
exec python scripts/evaluate/vitdet_vid.py "$CONFIG"
