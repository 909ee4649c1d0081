#!/usr/bin/env python3
"""Emulate the driver's bench stdout-tail capture and parse.

The grading driver runs `sbt -batch "runMain graft.Bench"`, keeps the
last ~2000 chars of STDOUT, and json-parses the LAST line. Eight rounds
of PERF_*.json came back `parsed: null` because sbt (a) prefixed every
forked-app line with "[info] " and (b) appended a "[success] Total
time: ..." trailer — both fixed in build.sbt round 18
(run/outputStrategy := StdoutOutput, showSuccess := false). This script
is the local gate: feed it a captured stdout file (or pipe stdout in)
and it applies the driver's exact discipline.

Usage:
    sbt -batch "runMain graft.Bench" > /tmp/bench_stdout.txt 2>/tmp/bench_stderr.txt
    python3 tools/check_bench_tail.py /tmp/bench_stdout.txt

Exit 0 iff the last line of the last 2000 chars is valid JSON carrying
"metric" and "value" keys. Prints the parsed summary.
"""
import json
import sys

TAIL_BYTES = 2000


def main() -> int:
    if len(sys.argv) > 1:
        with open(sys.argv[1], "rb") as f:
            data = f.read()
    else:
        data = sys.stdin.buffer.read()
    tail = data[-TAIL_BYTES:].decode("utf-8", errors="replace")
    lines = [ln for ln in tail.splitlines() if ln.strip()]
    if not lines:
        print("FAIL: empty stdout tail", file=sys.stderr)
        return 1
    last = lines[-1]
    try:
        obj = json.loads(last)
    except json.JSONDecodeError as e:
        print(f"FAIL: last line is not JSON ({e})", file=sys.stderr)
        print(f"last line was: {last[:300]!r}", file=sys.stderr)
        return 1
    for key in ("metric", "value"):
        if key not in obj:
            print(f"FAIL: parsed JSON lacks {key!r}: {obj}", file=sys.stderr)
            return 1
    print("OK: driver tail-parse contract holds")
    print(json.dumps(obj, indent=None))
    return 0


if __name__ == "__main__":
    sys.exit(main())
