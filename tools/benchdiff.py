#!/usr/bin/env python3
"""Cross-round bench adjudicator: joins two bench.json files and flags
per-query regressions that are SIGNAL, not jitter.

A delta counts as a regression only when BOTH hold:
  - ratio new/old > RATIO_MIN (default 1.5), and
  - the absolute delta exceeds the query's own emitted relative spread
    (trimmed: 2nd-highest minus 2nd-lowest over median since round 6;
    raw (max-min)/median before) from EITHER round, scaled to seconds.

Usage: python3 tools/benchdiff.py OLD.json NEW.json [--ratio 1.5 | --ratio=1.5]
                                  [--solo-old S.json] [--solo-new S.json]
--solo-* files (BENCH_SOLO_r{N}.json, fresh-JVM medians from
tools.BenchProbe) OVERRIDE that side's suite times for their keys —
solo medians carry none of the ±15% suite-interleave band, so they are
preferred evidence wherever committed.
Prints a markdown table (paste into SCALE.md) plus a one-line summary.
Exit code 0 always — this is an adjudication aid, not a gate.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main():
    argv = sys.argv[1:]
    args, ratio_min, i = [], 1.5, 0
    solo_old = solo_new = None
    while i < len(argv):
        a = argv[i]
        if a.startswith("--ratio"):
            if "=" in a:
                ratio_min = float(a.split("=", 1)[1])
            else:  # space-separated form: consume the next token
                i += 1
                ratio_min = float(argv[i])
        elif a.startswith("--solo-old"):
            if "=" in a:
                solo_old = a.split("=", 1)[1]
            else:
                i += 1
                solo_old = argv[i]
        elif a.startswith("--solo-new"):
            if "=" in a:
                solo_new = a.split("=", 1)[1]
            else:
                i += 1
                solo_new = argv[i]
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    old, new = load(args[0]), load(args[1])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    osp, nsp = old.get("spread", {}), new.get("spread", {})
    # solo medians override suite times (and their spread bands) —
    # fresh-JVM numbers carry no suite-interleave jitter
    for solo_path, q, sp, label in ((solo_old, oq, osp, "old"),
                                    (solo_new, nq, nsp, "new")):
        if solo_path:
            s = load(solo_path)
            for k, v in s.get("queries", {}).items():
                if k in q:
                    q[k] = v
                    sp[k] = s.get("spread", {}).get(k, 0.0)
            print(f"(solo medians override {label} side for "
                  f"{len(s.get('queries', {}))} keys: {solo_path})")
    common = sorted(set(oq) & set(nq))
    rows, improved = [], []
    for k in common:
        o, n = oq[k], nq[k]
        if o <= 0 or n <= 0:
            continue
        ratio = n / o
        # spread is relative (max-min)/median; convert to an absolute
        # seconds band around each round's own median
        band = max(osp.get(k, 0.0) * o, nsp.get(k, 0.0) * n)
        if ratio > ratio_min and (n - o) > band:
            rows.append((k, o, n, ratio, band))
        elif ratio < 1.0 / ratio_min and (o - n) > band:
            improved.append((k, o, n, ratio))
    rows.sort(key=lambda r: -r[3])
    # totals and ratios compare IDENTICAL key sets: only keys present
    # and successful (>0) on BOTH sides, so a query failing in one
    # round drops from both sums instead of skewing the ratio
    both_ok = [k for k in common if oq[k] > 0 and nq[k] > 0]
    tot_o = sum(oq[k] for k in both_ok)
    tot_n = sum(nq[k] for k in both_ok)
    print(f"## benchdiff: {args[0]} -> {args[1]}")
    # control-key adjudication (round-12 artifacts carry end-of-suite
    # control medians): a uniform control inflation ≈ the total's ratio
    # marks the NEW run as host-noise, not a code regression
    co, cn = old.get("control", {}), new.get("control", {})
    ck = sorted(set(co) & set(cn))
    audit_ctl = set(new.get("audit_keys", []) or old.get("audit_keys", []))
    if ck:
        ratios = {k: cn[k] / co[k] for k in ck if co[k] > 0 and cn[k] > 0}
        if ratios:
            print("controls: " + ", ".join(
                f"{k}[{'audit' if k in audit_ctl else 'contract'}] "
                f"{co[k]:.2f}s -> {cn[k]:.2f}s ({r:.2f}x)"
                for k, r in sorted(ratios.items())) +
                " — if these track the total ratio, the drift is host noise")
            # round-13 lesson: sub-second contract controls are blind to
            # bursts landing on long-running audit keys — adjudicate the
            # audit TIER with the audit-tier control specifically
            a = [r for k, r in ratios.items() if k in audit_ctl]
            c = [r for k, r in ratios.items() if k not in audit_ctl]
            if a and c and max(a) > 1.3 * max(c):
                print("  note: audit-tier control inflated while contract "
                      "controls are clean — audit-window host burst; "
                      "distrust the audit tier's totals in the NEW run")
    print(f"common keys: {len(common)} ({len(both_ok)} ok both sides); "
          f"old total {tot_o:.2f}s, "
          f"new total {tot_n:.2f}s ({tot_n/tot_o:.2f}x); "
          f"regressions (ratio>{ratio_min} and delta>spread): {len(rows)}; "
          f"improvements: {len(improved)}")
    # tier-aware totals over keys ok on BOTH sides (audit tier =
    # deliberately expensive evidence gates; membership from either
    # file's audit_keys so pre-tier files still diff cleanly)
    audit = set(new.get("audit_keys", []) or old.get("audit_keys", []))
    if audit:
        for tier, keys in (("contract", [k for k in both_ok if k not in audit]),
                           ("audit", [k for k in both_ok if k in audit])):
            to = sum(oq[k] for k in keys)
            tn = sum(nq[k] for k in keys)
            if to > 0:
                print(f"  {tier} tier ({len(keys)} common-ok keys): "
                      f"{to:.2f}s -> {tn:.2f}s ({tn/to:.2f}x)")
    if rows:
        print("\n| query | old s | new s | ratio | spread band s |")
        print("| --- | --- | --- | --- | --- |")
        for k, o, n, r, b in rows:
            print(f"| {k} | {o:.3f} | {n:.3f} | {r:.2f}x | {b:.3f} |")
    if improved:
        print("\nimproved >%.1fx beyond spread: %s" % (
            ratio_min, ", ".join(f"{k} ({o:.2f}->{n:.2f})" for k, o, n, _ in improved)))
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print(f"\nnew-only keys ({len(only_new)}): {', '.join(only_new)}")


if __name__ == "__main__":
    main()
