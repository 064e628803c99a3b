#!/bin/sh
# Copy the publishable subset of this repo to a clean checkout
# (equivalent of the reference's tools/make_clean_repo.sh).
set -e
DEST="${1:?usage: make_clean_repo.sh <dest-dir>}"
SRC="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$DEST"
cd "$SRC"
git archive HEAD | tar -x -C "$DEST"
echo "clean repo at $DEST"
