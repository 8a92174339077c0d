#!/bin/bash
# Quick external-pressure probe for this Firecracker guest: average
# STEAL cores over a short idle window. Co-tenant guests on the
# oversubscribed physical host are invisible to guest process listings
# but show up as steal time. Gate benchmarks on this: > ~0.3 cores avg
# means a bad window (r6 forensics, CLAUDE.md).
# Usage: tools/steal_probe.sh [seconds]   (default 15)
SECS=${1:-15}
read -r _ u1 n1 s1 i1 w1 irq1 sirq1 st1 _ < /proc/stat
sleep "$SECS"
read -r _ u2 n2 s2 i2 w2 irq2 sirq2 st2 _ < /proc/stat
python3 - "$st1" "$st2" "$SECS" <<'EOF'
import sys
st1, st2, secs = int(sys.argv[1]), int(sys.argv[2]), float(sys.argv[3])
cores = (st2 - st1) / 100.0 / secs
print(f"steal_cores_avg={cores:.2f} window={secs:.0f}s verdict={'QUIET' if cores < 0.3 else 'BUSY'}")
EOF
