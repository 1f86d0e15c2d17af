"""Regenerate the COVERAGE.md driver-verification ledger section.

Usage: python tools/driver_ledger.py
Rewrites everything from the '## Driver-verification ledger' header to EOF in
COVERAGE.md, based on CORRECTNESS_r0*.json and the current queries() order.
Run after each round's CORRECTNESS file lands, after rotating
_DRIVER_PRIORITY (VERDICT r4 item 1).
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEADER = "## Driver-verification ledger (query → round first driver-verified)"


def main() -> None:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    rounds: dict[int, list[str]] = {}
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnum = int(re.search(r"_r0*(\d+)", os.path.basename(path)).group(1))
        keys = set(json.load(open(path)).keys())
        rounds[rnum] = sorted(keys - seen)
        seen |= keys

    names = list(entry.queries().keys())
    backlog = [n for n in names if n not in seen]

    lines = [
        "",
        HEADER,
        "",
        f"Total queries: {len(names)}. Driver-verified (union "
        f"r1–r{max(rounds)}): {len(seen)}. "
        f"Never-driver-verified backlog: {len(backlog)} (drains 50/round via the",
        "`_DRIVER_PRIORITY` head-50 rotation; the next round's head-50 are the",
        "first 50 names of `queries()` — all never driver-verified).",
        "",
    ]
    for r in sorted(rounds):
        lines.append(f"**First verified in r{r}** ({len(rounds[r])}):")
        lines.append(textwrap.fill(", ".join(rounds[r]), width=78))
        lines.append("")
    lines.append("**Queued next round (head-50 of `_DRIVER_PRIORITY`)**:")
    lines.append(textwrap.fill(", ".join(names[:50]), width=78))
    lines.append("")
    lines.append(
        f"**Remaining backlog after the queued round** "
        f"({len(backlog) - 50} names): every name in"
    )
    lines.append("`queries()` not listed above; regenerate this section with")
    lines.append(
        "`python tools/driver_ledger.py` after each round's CORRECTNESS file lands."
    )

    cov_path = os.path.join(REPO, "COVERAGE.md")
    text = open(cov_path).read()
    idx = text.find(HEADER)
    if idx >= 0:
        # strip back to the blank line that precedes the header
        idx = text.rfind("\n", 0, idx)
        text = text[:idx]
    open(cov_path, "w").write(text + "\n".join(lines) + "\n")
    print(
        f"ledger regenerated: {len(seen)} verified, {len(backlog)} backlog, "
        f"head-50 queued"
    )


if __name__ == "__main__":
    main()
