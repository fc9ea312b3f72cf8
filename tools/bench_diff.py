"""Cross-round per-query bench comparison.

Reads two bench artifacts carrying full per-query maps (BENCH_LATEST.json
or the per-round BENCH_FULL_rNN.json archives, VERDICT r9 #5) and prints
the aggregate ratio over the common queries plus the worst regressions
and best improvements — the audit the r9 judge had to reconstruct with
``git show`` before the full maps were archived per round.

Usage::

    python tools/bench_diff.py BENCH_FULL_r10.json BENCH_LATEST.json [N]

Ratios divide like-by-like (median vs median for r5+ artifacts). The
calibration blocks, when both artifacts carry them, are printed so a
suite-wide drift can be read as box weather instead of plan change
(SCALING.md "weather incident" methodology): divide a per-query delta
by the JVM calibration ratio before believing it.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # round stubs wrap the real payload under 'parsed' — null when that
    # round's stdout tail-truncated (BENCH_r04-06.json are exactly this)
    if "queries" not in d and "parsed" in d:
        d = d["parsed"]
        if d is None:
            raise SystemExit(
                f"{path}: parsed is null (truncated-stdout round) — "
                "use that round's BENCH_FULL_rNN.json archive instead"
            )
    if "queries" not in d or not isinstance(d["queries"], dict):
        raise SystemExit(
            f"{path}: no per-query map (headline-only artifact?) — "
            "use BENCH_FULL_rNN.json or BENCH_LATEST.json"
        )
    # the compact stdout doc carries only the 3 slowest queries, and its
    # values are compute-substituted (trigger wait removed) — comparing
    # it against a full wall-median map is a 3-query apples-to-oranges
    # ratio presented as the round comparison; refuse it
    n_q = d.get("n_queries")
    if isinstance(n_q, int) and len(d["queries"]) < n_q:
        raise SystemExit(
            f"{path}: compact summary ({len(d['queries'])} of {n_q} "
            "queries, compute-substituted) — use the round's "
            "BENCH_FULL_rNN.json archive or BENCH_LATEST.json"
        )
    return d


def _calibration_ratio(old: dict, new: dict) -> float | None:
    try:
        a = old["calibration"]["after"]["jvm_allcore_s"]
        b = new["calibration"]["after"]["jvm_allcore_s"]
        return b / a if a else None
    except (KeyError, TypeError):
        return None


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    old, new = _load(old_path), _load(new_path)
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if not common:
        raise SystemExit("no common queries between the two artifacts")

    old_sum = sum(oq[k] for k in common)
    new_sum = sum(nq[k] for k in common)
    print(f"common queries: {len(common)}")
    print(
        f"aggregate: {new_sum:.1f} s vs {old_sum:.1f} s "
        f"= {new_sum / old_sum:.3f}x ({new_path} / {old_path})"
    )
    cal = _calibration_ratio(old, new)
    if cal is not None:
        print(
            f"jvm calibration ratio (new/old, after-suite): {cal:.3f} — "
            "divide per-query ratios by this before reading plan changes"
        )
    if only_old:
        print(f"only in {old_path} ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"only in {new_path} ({len(only_new)}): {', '.join(only_new)}")

    ratios = sorted(
        ((nq[k] / oq[k] if oq[k] else float("inf"), k) for k in common),
        reverse=True,
    )
    # split the one sorted list so a query can never print as BOTH a
    # regression and an improvement when common < 2*top_n
    worst = ratios[:top_n]
    best = ratios[top_n:][-top_n:][::-1]
    print(f"\nworst {len(worst)} regressions (ratio, old s -> new s):")
    for r, k in worst:
        print(f"  {r:6.2f}x  {oq[k]:7.3f} -> {nq[k]:7.3f}  {k}")
    print(f"\nbest {len(best)} improvements:")
    for r, k in best:
        print(f"  {r:6.2f}x  {oq[k]:7.3f} -> {nq[k]:7.3f}  {k}")


if __name__ == "__main__":
    main()
