#!/usr/bin/env python
"""Evidence-file retention for the repo root (r13, r12 verdict task #5 —
the repo-level twin of X125's index bookkeeping retention): per-round
evidence artifacts accrete at the root (5-8 files x N rounds), and by
round 12 the listing no longer fit a screen. This moves every artifact of
rounds <= (latest - keep), i.e. everything older than the newest ``keep``
rounds, into ``evidence/archive/`` and regenerates a one-line-per-file
index there, keeping at the root only:

- the newest KEEP_ROUNDS rounds' artifacts (the judge reads BENCH_r{N}
  against BENCH_r{N-1});
- everything round-less: BASELINE.*, SURVEY/VERDICT/ADVICE, BENCH_NOTES,
  PROGRESS.jsonl, COPYCHECK/LEAKCHECK, FIXTURES/TESTDATA/PAPERS/SNIPPETS.

Archived files keep their exact names, so any reference like
``BENCH_r08.json`` resolves by prepending ``evidence/archive/``. The move
is plain rename within the work tree — run before the round's single
evidence commit so git records it as a rename.

Usage: ``python tools/archive_evidence.py [--keep 2] [--dry-run]``
(``make record`` runs it LAST — after the round's artifacts are written,
so "newest keep rounds" includes the round just recorded and the root
holds exactly those; also standalone-safe, idempotent).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARCHIVE = os.path.join(ROOT, "evidence", "archive")

#: every per-round artifact family ever written at the root; the trailing
#: round number decides retention. Anything not matching stays put.
ROUND_FILE = re.compile(
    r"^(BENCH|BENCH_FULL|CORRECTNESS|CORRECTNESS_FULL|"
    r"CORRECTNESS_FULL_SF01|CORRECTNESS_FULL_SF0001|"
    r"PYTEST_DRIVER_SCALE|SCALE_PROBE)_r(\d+)\.(json|txt)$"
)


def round_files(dirpath: str) -> list[tuple[str, int]]:
    out = []
    for name in sorted(os.listdir(dirpath)):
        m = ROUND_FILE.match(name)
        if m:
            out.append((name, int(m.group(2))))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep", type=int, default=2,
                    help="newest rounds to keep at the root")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    at_root = round_files(ROOT)
    if not at_root:
        print("no per-round evidence files at root; nothing to do")
        return 0
    latest = max(r for _, r in at_root)
    cutoff = latest - args.keep + 1  # archive everything with round < cutoff
    to_move = [(n, r) for n, r in at_root if r < cutoff]

    if to_move and not args.dry_run:
        os.makedirs(ARCHIVE, exist_ok=True)
    for name, _ in to_move:
        src, dst = os.path.join(ROOT, name), os.path.join(ARCHIVE, name)
        if args.dry_run:
            print(f"would move {name} -> evidence/archive/")
            continue
        if os.path.exists(dst):
            os.remove(dst)  # idempotent re-run after a partial move
        os.rename(src, dst)
        print(f"archived {name}")

    if args.dry_run:
        return 0

    # regenerate the index over whatever the archive now holds
    if os.path.isdir(ARCHIVE):
        archived = round_files(ARCHIVE)
        by_round: dict[int, list[str]] = {}
        for name, r in archived:
            by_round.setdefault(r, []).append(name)
        lines = [
            "# Archived per-round evidence",
            "",
            f"Rounds <= r{cutoff - 1:02d} moved out of the repo root by "
            "`tools/archive_evidence.py` (run by `make record`); the "
            f"newest {args.keep} rounds stay at the root. File names are "
            "unchanged — prepend `evidence/archive/` to any historical "
            "reference.",
            "",
            "Note the one-round driver lag (r15, r14 verdict #2): the "
            "driver writes the smoke-lane pair `BENCH_r{N}.json` / "
            "`CORRECTNESS_r{N}.json` AFTER the round's final sha, so "
            "round N's pair can only be committed (and later archived) "
            "in round N+1 — a round-N tree missing them at HEAD is the "
            "pipeline's shape, not a lost record. The round-start "
            "commit of round N+1 must include them.",
            "",
        ]
        for r in sorted(by_round):
            for name in sorted(by_round[r]):
                lines.append(f"- r{r:02d}: {name}")
        with open(os.path.join(ARCHIVE, "INDEX.md"), "w") as f:
            f.write("\n".join(lines) + "\n")
        print(
            f"index: {len(archived)} files across "
            f"{len(by_round)} rounds -> evidence/archive/INDEX.md"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
