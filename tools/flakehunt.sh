#!/usr/bin/env bash
# Whole-surface parallelism-determinism audit: run the full Verify dump at
# two CPU counts and byte-compare every query's output (sorted rows,
# stringified values). Catches the driver-flake class (round 10's
# x_embed_cov: partition-order float noise flipping a rounding boundary)
# across the entire surface, beyond DeterminismSpec's in-suite sample.
#
#   tools/flakehunt.sh [sfdir] [query ...]   # default /root/testdata/sf0.01
#   tools/flakehunt.sh /root/testdata/sf0.1 @bench
#     — the bench-headline sweep at the bench scale factor (@bench expands
#       to SparkEntry.benchNames inside Verify); run it before the round
#       snapshot so the sf0.1 determinism check is automated, not hand-done
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
shift || true
QUERIES="$*"
out=$(mktemp -d)
for c in 3 8; do
  SPARK_GRAFT_CPUS=$c sbt -batch \
    "runMain graft.Verify $SF $out/cpu$c $QUERIES" > "$out/log$c" 2>&1 \
    || { tail -5 "$out/log$c" >&2; exit 1; }
done
python3 - "$out" <<'EOF'
import duckdb, glob, os, sys
base = sys.argv[1]
con = duckdb.connect()
names = sorted(os.path.basename(d) for d in glob.glob(f'{base}/cpu3/*')
               if os.path.isdir(d))
bad = []
for n in names:
    a = con.execute(f"SELECT * FROM read_parquet('{base}/cpu3/{n}/*.parquet')").df()
    b = con.execute(f"SELECT * FROM read_parquet('{base}/cpu8/{n}/*.parquet')").df()
    ca, cb = sorted(a.columns), sorted(b.columns)
    if ca != cb:
        bad.append((n, 'schema')); continue
    sa = a.reindex(ca, axis=1).astype(str).sort_values(by=ca).reset_index(drop=True)
    sb = b.reindex(cb, axis=1).astype(str).sort_values(by=cb).reset_index(drop=True)
    if sa.shape != sb.shape or not (sa.values == sb.values).all():
        bad.append((n, f'{sa.shape} vs {sb.shape}'))
print(f'FLAKEHUNT: compared {len(names)} queries;',
      'NONE differ' if not bad else f'MISMATCHES: {bad}')
sys.exit(1 if bad else 0)
EOF
