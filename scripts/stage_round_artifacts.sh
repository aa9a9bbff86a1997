#!/bin/sh
# Stage the driver-generated round artifacts (bench, correctness,
# verdict/advice, scan outputs) so the judged state lands in git
# history — the recurring round-close hygiene item. Run at the end of
# a round, then commit:
#
#   scripts/stage_round_artifacts.sh && git commit -m "round N artifacts"
#
# Idempotent: re-staging unchanged files is a no-op.
set -eu
cd "$(dirname "$0")/.."
# (PROGRESS.jsonl / COPYCHECK.json / LEAKCHECK.json are intentionally
# gitignored scan scratch — not staged)
for f in BENCH_r*.json CORRECTNESS_r*.json BENCH_LOCAL_r*.json \
         VERDICT.md ADVICE.md BASELINE.json BASELINE.md BENCH_NOTES.md; do
    [ -e "$f" ] && git add "$f"
done
git status --short
