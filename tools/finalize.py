#!/usr/bin/env python3
"""Final-chain gate sync: regenerate the NOTES.md gate block from the
committed artifacts IN THE SAME COMMIT that updates them, so the round
header can never drift from what a judge reproduces (the r10/r11 drift
class — numbers written from an earlier chain than the artifacts).

Usage:
    python tools/finalize.py CORRECTNESS_rN.json BENCH_DETAIL.json [sbt.log]

Rewrites the region between the sentinels
    <!-- GATES:BEGIN (tools/finalize.py — do not edit by hand) -->
    <!-- GATES:END -->
in NOTES.md with tools/gates.py's output over the named artifacts.
Exits nonzero if the sentinels are missing (add them to the round
section first) or gates.py fails — a failed sync must fail the chain,
not silently keep stale numbers.
"""
import subprocess
import sys

BEGIN = "<!-- GATES:BEGIN (tools/finalize.py — do not edit by hand) -->"
END = "<!-- GATES:END -->"


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    out = subprocess.run(
        [sys.executable, "tools/gates.py"] + sys.argv[1:],
        capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr)
        return out.returncode
    text = open("NOTES.md").read()
    i, j = text.find(BEGIN), text.find(END)
    if i < 0 or j < 0 or j < i:
        print(f"NOTES.md lacks the gate sentinels {BEGIN!r} … {END!r}",
              file=sys.stderr)
        return 2
    new = text[: i + len(BEGIN)] + "\n" + out.stdout.rstrip() + "\n" + text[j:]
    open("NOTES.md", "w").write(new)
    print(f"NOTES.md gate block regenerated from {', '.join(sys.argv[1:])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
