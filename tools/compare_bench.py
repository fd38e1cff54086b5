"""Compare two BENCH_FULL.json payloads and attribute the deltas.

Usage: python tools/compare_bench.py OLD.json NEW.json

For every headline query it reports the median ratio new/old and flags it
only when the movement is BOTH outside the union of the two recorded
[min, max] spreads AND out of line with the set-wide median ratio — the
two tests that separate a plan regression from this box's documented
±30-40% whole-machine variance (SCALE.md). Exit code 1 iff any query is
flagged, so the comparison can gate CI.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    oq, nq = old["queries"], new["queries"]
    os_, ns = old.get("queries_spread", {}), new.get("queries_spread", {})
    shared = sorted(set(oq) & set(nq))
    if not shared:
        print("no shared headline queries")
        return 2
    ratios = {k: nq[k] / oq[k] for k in shared if oq[k] > 0}
    set_ratio = sorted(ratios.values())[len(ratios) // 2]
    print(
        f"headline total: {old.get('value')} -> {new.get('value')} "
        f"(set median ratio {set_ratio:.2f}x — the whole-box factor)"
    )
    flagged = []
    for k in shared:
        r = ratios.get(k)
        if r is None:
            continue
        # spread test: does either run's band contain the other's median?
        o_lo, o_hi = os_.get(k, [oq[k], oq[k]])
        n_lo, n_hi = ns.get(k, [nq[k], nq[k]])
        overlap = not (n_lo > o_hi or o_lo > n_hi)
        # relative test: movement beyond the set-wide factor by >40%?
        rel = r / set_ratio
        suspicious = (not overlap) and (rel > 1.4 or rel < 1 / 1.4)
        mark = "  << INVESTIGATE" if suspicious else ""
        print(
            f"  {k:42s} {oq[k]:7.3f} -> {nq[k]:7.3f}  ({r:4.2f}x, "
            f"rel {rel:4.2f}x){mark}"
        )
        if suspicious:
            flagged.append(k)
    if flagged:
        print(f"\n{len(flagged)} query(ies) moved beyond spread AND beyond the "
              f"whole-box factor: {', '.join(flagged)}")
        return 1
    print("\nall movements are within spread or uniform with the box factor")
    return 0


if __name__ == "__main__":
    sys.exit(main())
