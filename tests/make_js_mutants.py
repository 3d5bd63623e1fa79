"""Regenerate tests/goldens/js_mutants.json — the JS-harness mutation
battery fixture (VERDICT r4 next #4).

Runs the FULL auto-generated mutation pool (tests/js_mutation.py: operator
flips, boundary swaps, min/max swaps, logic flips, constant nudges over
applogic.js + freqscale.js) against the differential case batteries,
records the measured kill rate, and pins a diverse must-kill subset that
tests/test_mutation_battery.py re-verifies every suite run.

Run after editing applogic.js/freqscale.js (sites are pinned by source
line): python -m tests.make_js_mutants
"""

import json
import pathlib
from collections import defaultdict

from tests.js_mutation import kill_report

GOLDEN = pathlib.Path(__file__).resolve().parent / "goldens" / "js_mutants.json"

MUST_KILL_TARGET = 80  # pinned subset size (>= the 50 the spec demands)


def main():
    killed, survived = kill_report()
    total = len(killed) + len(survived)
    rate = len(killed) / total
    print(f"pool: {total} mutants, killed {len(killed)}, rate {rate:.3f}")

    # diverse must-kill selection: round-robin across (file, operator)
    # groups so the pinned set spans every mutation class the harness
    # catches; 'hang' kills are excluded (each costs its full timeout)
    groups = defaultdict(list)
    for k in killed:
        if k["evidence"].startswith("hang"):
            continue
        groups[(k["file"], k["from"], k["to"])].append(k)
    selected = []
    idx = 0
    while len(selected) < MUST_KILL_TARGET:
        advanced = False
        for key in sorted(groups):
            bucket = groups[key]
            if idx < len(bucket):
                selected.append(bucket[idx])
                advanced = True
                if len(selected) >= MUST_KILL_TARGET:
                    break
        if not advanced:
            break
        idx += 1

    doc = {
        "total_candidates": total,
        "killed": len(killed),
        "survived": len(survived),
        "kill_rate": round(rate, 4),
        "survivor_summary": sorted(
            {f'{s["file"]} {s["from"]!r}->{s["to"]!r} #{s["occurrence"]}' for s in survived}
        ),
        "must_kill": [
            {k: s[k] for k in ("file", "from", "to", "occurrence", "context", "evidence")}
            for s in selected
        ],
    }
    GOLDEN.write_text(json.dumps(doc, indent=1))
    print(f"wrote {GOLDEN} with {len(selected)} must-kill sites")


if __name__ == "__main__":
    main()
