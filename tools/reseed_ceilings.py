#!/usr/bin/env python3
"""BenchGate ceiling RATCHET-DOWN (round 14).

Ceilings in src/main/scala/graft/BenchCeilings.scala only loosen with
age: they were seeded from a past round's measured mins, so a query
that got permanently faster keeps a stale, over-generous ceiling and
the gate stops tracking the engine's actual speed. Every gate run
writes its per-query min-of-3 into bench_gate.json; this tool merges
those mins across one or more gate/benchdetail artifacts and proposes
LOWER ceilings (formula: merged_min * 1.8 + 0.3, the seeding formula)
for queries whose merged min dropped >= 20% below the min implied by
the current ceiling ((ceiling - 0.3) / 1.8). It NEVER proposes a
raise — raising a ceiling requires a plan read and a deliberate edit.

Usage:
  python3 tools/reseed_ceilings.py bench_gate.json [more.json ...]
  python3 tools/reseed_ceilings.py --apply bench_gate.json ...

Without --apply, prints the proposed replacement lines; with --apply,
rewrites BenchCeilings.scala in place (the diff still goes through
review/commit like any source change).
"""
import json
import re
import sys

CEILINGS = "src/main/scala/graft/BenchCeilings.scala"
ENTRY = re.compile(r'^(\s*)"([a-z0-9_]+)"\s*->\s*([0-9.]+)(,?)(\s*//.*)?$')


def load_mins(paths):
    mins = {}
    for p in paths:
        with open(p) as f:
            data = json.load(f)
        qs = data.get("queries", data if isinstance(data, dict) else {})
        for q, v in qs.items():
            try:
                v = float(v)
            except (TypeError, ValueError):
                continue
            if q not in mins or v < mins[q]:
                mins[q] = v
    return mins


def main():
    args = [a for a in sys.argv[1:] if a != "--apply"]
    apply_mode = "--apply" in sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    mins = load_mins(args)
    out_lines = []
    proposals = []
    with open(CEILINGS) as f:
        for line in f:
            m = ENTRY.match(line.rstrip("\n"))
            if m:
                indent, name, ceil_s, comma, _comment = m.groups()
                ceiling = float(ceil_s)
                implied_min = (ceiling - 0.3) / 1.8
                got = mins.get(name)
                if got is not None and implied_min > 0 and got <= implied_min * 0.8:
                    new_ceiling = round(got * 1.8 + 0.3, 2)
                    if new_ceiling < ceiling:
                        proposals.append((name, ceiling, new_ceiling, got))
                        line = (f'{indent}"{name}" -> {new_ceiling}{comma}'
                                f"  // reseed: min {got:.3f}\n")
                        out_lines.append(line)
                        continue
            out_lines.append(line if line.endswith("\n") else line + "\n")
    for name, old, new, got in sorted(proposals):
        print(f"LOWER {name:34s} {old:6.2f} -> {new:5.2f}  (merged min {got:.3f})")
    print(f"{len(proposals)} ceilings lowered, 0 raised (raises need a plan read)")
    if apply_mode and proposals:
        with open(CEILINGS, "w") as f:
            f.writelines(out_lines)
        print(f"applied to {CEILINGS}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
